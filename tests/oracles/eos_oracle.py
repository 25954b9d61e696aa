"""Scalar numpy oracle of the reference equation of state.

Transcribed from /root/reference/phy/mod_eos.F90 (coefficients :37-54,
inieos :85-160, rho :163-178, sig :192-211, tofsig/sofsig :347-389,
p_alpha :391-436).  For p_alpha the oracle evaluates the *analytic log
expression* the reference documents (mod_eos.F90:414-416) rather than
the truncated series, so the test independently validates the series
approximation used in production.
"""

import math

a11 = 9.9985372432159340e+02
a12 = 1.0380621928183473e+01
a13 = 1.7073577195684715e+00
a14 = -3.6570490496333680e-02
a15 = -7.3677944503527477e-03
a16 = -3.5529175999643348e-03
b11 = 1.7083494994335439e-06
b12 = 7.1567921402953455e-09
b13 = 1.2821026080049485e-09
a21 = 1.0
a22 = 1.0316374535350838e-02
a23 = 8.9521792365142522e-04
a24 = -2.8438341552142710e-05
a25 = -1.1887778959461776e-05
a26 = -4.0163964812921489e-06
b21 = 1.1995545126831476e-09
b22 = 5.5234008384648383e-12
b23 = 8.4310335919950873e-13

alpha0 = 1.0e-3


def inieos(pref):
    """Potential-density coefficients at reference pressure pref
    (mod_eos.F90:85-133).  Returns dict of ap..-coefficients."""
    ap21 = a21 + b21 * pref
    ap22 = a22 + b22 * pref
    ap23 = a23 + b23 * pref
    ap24, ap25, ap26 = a24, a25, a26
    return dict(
        ap21=ap21, ap22=ap22, ap23=ap23, ap24=ap24, ap25=ap25, ap26=ap26,
        ap11=a11 + b11 * pref - ap21 / alpha0,
        ap12=a12 + b12 * pref - ap22 / alpha0,
        ap13=a13 + b13 * pref - ap23 / alpha0,
        ap14=a14 - ap24 / alpha0,
        ap15=a15 - ap25 / alpha0,
        ap16=a16 - ap26 / alpha0)


def rho(p, th, s):
    return ((a11 + (a12 + a14 * th + a15 * s) * th + (a13 + a16 * s) * s
             + (b11 + b12 * th + b13 * s) * p)
            / (a21 + (a22 + a24 * th + a25 * s) * th + (a23 + a26 * s) * s
               + (b21 + b22 * th + b23 * s) * p))


def sig(c, th, s):
    return ((c['ap11'] + (c['ap12'] + c['ap14'] * th + c['ap15'] * s) * th
             + (c['ap13'] + c['ap16'] * s) * s)
            / (c['ap21'] + (c['ap22'] + c['ap24'] * th + c['ap25'] * s) * th
               + (c['ap23'] + c['ap26'] * s) * s))


def tofsig(c, sg, s):
    a = c['ap14'] - c['ap24'] * sg
    b = c['ap12'] - c['ap22'] * sg + (c['ap15'] - c['ap25'] * sg) * s
    cc = c['ap11'] - c['ap21'] * sg + (c['ap13'] - c['ap23'] * sg
                                       + (c['ap16'] - c['ap26'] * sg) * s) * s
    return (-b - math.sqrt(b * b - 4.0 * a * cc)) / (2.0 * a)


def sofsig(c, sg, th):
    a = c['ap16'] - c['ap26'] * sg
    b = c['ap13'] - c['ap23'] * sg + (c['ap15'] - c['ap25'] * sg) * th
    cc = c['ap11'] - c['ap21'] * sg + (c['ap12'] - c['ap22'] * sg
                                       + (c['ap14'] - c['ap24'] * sg)
                                       * th) * th
    return (-b + math.sqrt(b * b - 4.0 * a * cc)) / (2.0 * a)


def p_alpha_analytic(p1, p2, th, s):
    """The exact log-form integral of specific volume in pressure
    (mod_eos.F90:414-416 comment) — independent of the production
    series."""
    a1 = a11 + (a12 + a14 * th + a15 * s) * th + (a13 + a16 * s) * s
    a2 = a21 + (a22 + a24 * th + a25 * s) * th + (a23 + a26 * s) * s
    b1 = b11 + b12 * th + b13 * s
    b2 = b21 + b22 * th + b23 * s
    return (b2 * (p2 - p1)
            + (a2 - a1 * b2 / b1)
            * math.log((a1 + b1 * p2) / (a1 + b1 * p1))) / b1


def delphi_analytic(p1, p2, th, s):
    """Exact geopotential difference: -integral alpha dp from p1 to p2."""
    return -p_alpha_analytic(p1, p2, th, s)

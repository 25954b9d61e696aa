"""Loop-level oracle of the barotropic substep weight schedule.

Transcribed from /root/reference/phy/mod_barotp.F90:328-358 (the
per-block woa/wob/wna/wnb settings, which PERSIST across blocks unless
reset) and :387,845 (lll0 = 1, advancing by lstep/2 per block; each
block runs lll = lll0 .. lll0+lstep/2-1)."""


def weight_schedule(lstep):
    """Returns {block nb: [(lll, wo, wm, wn), ...]} for nb = 1..5."""
    out = {}
    lll0 = 1
    woa = wob = wna = wnb = 0.0
    for nb in range(1, 6):
        if nb == 1:
            lll0 = 1
            woa = -1.0 / lstep
            wob = 0.5 + (lll0 - 0.5) / lstep
            wna = 0.0
            wnb = 0.0
        elif nb == 2:
            woa = 0.0
            wob = 0.0
            wna = 1.0 / lstep
            wnb = -(lll0 - 0.5) / lstep
        elif nb == 4:
            wna = 0.0
            wnb = 1.0
        rows = []
        for lll in range(lll0, lll0 + lstep // 2):
            wo = woa * lll + wob
            wn = wna * lll + wnb
            wm = 1.0 - wo - wn
            rows.append((lll, wo, wm, wn))
        out[nb] = rows
        lll0 = lll0 + lstep // 2
    return out

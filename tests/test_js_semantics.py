"""Cross-check the browser codec's float semantics from Python.

No JavaScript runtime exists in this image, so the JS modules in ``web/``
cannot be executed here (``web/test.html`` runs the byte-identity suite in
a browser). What CAN be verified here is the numerical foundation the JS
relies on: JS computes in doubles and rounds through ``Math.fround``, while
the codec's tables are defined in strict f32 arithmetic -- double rounding
could diverge. These tests emulate the exact JS expression shapes used in
``web/sea_encoder.mjs`` / ``web/sea_decoder.mjs`` (double op, then fround)
and assert equality with the f32-exact table builders for every
(scale_factor_bits, residual_size) combination.

This is how the ``f(f(IDEAL_POW_FACTOR[rb-1]) / f(sfb))`` form in the JS was
chosen: the naive ``f(IDEAL_POW_FACTOR[rb-1] / f(sfb))`` (double constant)
diverges for 4 of the 64 configurations.
"""

import numpy as np
import pytest

from sea_codec_tpu.models import vbr as pvbr
from sea_codec_tpu.ops import tables

F = lambda x: float(np.float32(x))  # Math.fround


@pytest.mark.parametrize("sfb", range(1, 9))
@pytest.mark.parametrize("rb", range(1, 9))
def test_js_table_expressions_match_f32_tables(sfb, rb):
    n = 1 << sfb
    # const pf = f(f(IDEAL_POW_FACTOR[rb-1]) / f(sfb))
    pf_js = np.float32(F(tables.IDEAL_POW_FACTOR[rb - 1]) / F(sfb))
    pf_py = np.float32(
        np.float32(tables.IDEAL_POW_FACTOR[rb - 1]) / np.float32(sfb)
    )
    assert pf_js == pf_py

    sf_py = tables.scale_factors(rb, sfb)
    rec_py = tables.reciprocals(rb, sfb)
    dqt_py = tables.dqt(rb, sfb)
    curve = tables._dqt_curve(rb)
    for i in range(1, n + 1):
        # truncI32(f(Math.pow(i, pf)))
        sf_js = tables._trunc_f32_to_i32(np.float32(pow(float(i), float(pf_js))))
        assert sf_js == sf_py[i - 1], (sfb, rb, i)
        # truncI32(f(65536 / f(scaleFactors[i])))
        rec_js = tables._trunc_f32_to_i32(np.float32(65536.0 / F(int(sf_py[i - 1]))))
        assert rec_js == rec_py[i - 1], (sfb, rb, i)
    for s in range(n):
        for k, cv in enumerate(curve):
            # truncI32(roundHalfAwayF32(f(scaleFactors[s] * curve[k])))
            prod = np.float32(float(int(sf_py[s])) * float(cv))
            v = tables._trunc_f32_to_i32(tables._round_half_away_f32(prod))
            assert v == dqt_py[s, 2 * k], (sfb, rb, s, k)


def _js_normalized_vbr(residual_bits, fpc, sfb, sff):
    d = [F(x) for x in (0.0, 0.0, 0.95, 0.05, 0.0, 0.0)]
    vbr = F(residual_bits)
    vbr = F(vbr - F(F(F(4) * 16.0 * 2.0) / F(fpc)))
    vbr = F(vbr - F(F(sfb) / F(sff)))
    vbr = F(vbr - F(2.0 / F(sff)))
    base = F(np.floor(np.float32(F(residual_bits))))
    nb = F(
        F(F(d[1] * F(base - 1.0)) + F(d[2] * base))
        + F(F(d[3] * F(base + 1.0)) + F(d[4] * F(base + 2.0)))
    )
    return np.float32(F(vbr - F(nb - base)))


def _js_interpolate(items, target):
    d = [F(x) for x in (0.0, 0.0, 0.95, 0.05, 0.0, 0.0)]
    frac = F(target - np.trunc(target))
    om = F(1.0 - frac)
    pct = [F(F(d[i] * frac) + F(d[i + 1] * om)) for i in range(4)]
    res = [0, 0, 0, 0]
    total = 0
    while total < items:
        remaining = items - total
        for i in range(4):
            v = int(np.trunc(F(F(remaining) * pct[i])))
            total += v
            res[i] += v
        if items - total == remaining:
            total += remaining
            res[1] += remaining
    return tuple(res)


@pytest.mark.parametrize("rbf", [1.5, 2.0, 2.5, 3.3, 5.0, 7.9, 8.0])
@pytest.mark.parametrize(
    "cfg", [(5120, 4, 20), (200, 3, 5), (1000, 5, 10), (100, 4, 10)]
)
def test_js_vbr_bitrate_math_matches(rbf, cfg):
    fpc, sfb, sff = cfg
    a = _js_normalized_vbr(rbf, fpc, sfb, sff)
    b = pvbr.normalized_vbr_bitrate(rbf, fpc, sfb, sff)
    assert a == b
    for items in (3, 10, 51, 512, 1024):
        assert _js_interpolate(items, b) == pvbr.interpolate_distribution(items, b)

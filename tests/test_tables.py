"""Table-generation tests with embedded golden values."""

import numpy as np

from sea_codec_tpu.ops import tables


def test_quant_tab_layout():
    qt = tables.quant_tab()
    offsets = tables.quant_offsets()
    assert qt.shape == (1028,)
    # rs=1 table (5 entries, reference zig-zag): [1,1,0,0,0]
    np.testing.assert_array_equal(qt[offsets[1] : offsets[1] + 5], [1, 1, 0, 0, 0])
    # rs=2 table (9 entries) incl. the special-case fixups at [2] and [6]
    np.testing.assert_array_equal(
        qt[offsets[2] : offsets[2] + 9], [3, 3, 1, 1, 0, 0, 0, 2, 2]
    )
    # rs=3 table (17 entries): zig-zag descends 7,5,3,1 in pairs offset by
    # one, then ascends 0,2,4,6 (the i=8 write overlaps the first half).
    np.testing.assert_array_equal(
        qt[offsets[3] : offsets[3] + 17],
        [7, 7, 7, 5, 5, 3, 3, 1, 0, 0, 2, 2, 4, 4, 6, 6, 6],
    )


def test_scale_factors_rb1_sfb4():
    # power factor = 12/4 = 3 -> cubes of 1..16
    sf = tables.scale_factors(1, 4)
    np.testing.assert_array_equal(sf, np.arange(1, 17, dtype=np.int64) ** 3)


def test_reciprocals_match_definition():
    for rb in range(1, 9):
        for sfb in (3, 4, 5):
            sf = tables.scale_factors(rb, sfb)
            rec = tables.reciprocals(rb, sfb)
            expected = (np.float32(65536.0) / sf.astype(np.float32)).astype(np.int32)
            np.testing.assert_array_equal(rec, expected)


def test_dqt_shape_and_symmetry():
    for rb in range(1, 9):
        t = tables.dqt(rb, 4)
        assert t.shape == (16, 1 << rb)
        # codes come in (+v, -v) pairs
        np.testing.assert_array_equal(t[:, 0::2], -t[:, 1::2])


def test_dqt_rb1_is_2x_scalefactor():
    t = tables.dqt(1, 4)
    sf = tables.scale_factors(1, 4)
    np.testing.assert_array_equal(t[:, 0], 2 * sf)


def test_dqt_stacked_padding():
    st = tables.dqt_stacked(4)
    assert st.shape == (8, 16, 256)
    for rb in range(1, 9):
        np.testing.assert_array_equal(st[rb - 1, :, : 1 << rb], tables.dqt(rb, 4))
        assert np.all(st[rb - 1, :, 1 << rb :] == 0)


def test_dqt_fits_int16_for_every_config():
    """The decode path streams dequantized values as int16 (half the HBM
    traffic of int32); this exhaustively pins that every legal (sfb, rs)
    table value fits: max |dqt| is 27090 across the whole domain."""
    import numpy as np

    from sea_codec_tpu.ops import tables

    m = max(int(np.abs(tables.dqt_stacked(sfb)).max()) for sfb in range(1, 9))
    assert m == 27090 and m < 32768

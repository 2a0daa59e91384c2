"""Golden tests for the 3D diagonal-slice order (SURVEY.md §4 item 4).

The order is bitstream-defining (CubeUtils.java:7-41): ascending
coordinate-sum planes, within a plane y outer, z middle, x inner.
"""

import numpy as np

from dct3d_tpu.ops import zigzag


def test_permutation_properties():
    for dims in [(8, 8, 8), (4, 4, 4), (8, 4, 2)]:
        w, h, d = dims
        pos = zigzag.diagonal_slices(w, h, d)
        assert pos.shape == (w * h * d, 3)
        flat = zigzag.zigzag_flat_indices(w, h, d)
        assert sorted(flat.tolist()) == list(range(w * h * d))
        sums = pos.sum(axis=1)
        assert np.all(np.diff(sums) >= 0), "coordinate sums must be monotone"


def test_golden_order_head_888():
    """First entries of the 8x8x8 order, hand-derived from the reference
    enumeration (y outer, z middle, x inner within each plane)."""
    pos = zigzag.diagonal_slices(8, 8, 8)
    expected_head = [
        (0, 0, 0),
        # sum 1: y=0:(z=0,x=1),(z=1,x=0); y=1:(z=0,x=0)
        (1, 0, 0), (0, 0, 1), (0, 1, 0),
        # sum 2: y=0: z=0:(x=2), z=1:(x=1), z=2:(x=0)
        #        y=1: z=0:(x=1), z=1:(x=0);  y=2: z=0:(x=0)
        (2, 0, 0), (1, 0, 1), (0, 0, 2), (1, 1, 0), (0, 1, 1), (0, 2, 0),
    ]
    assert [tuple(p) for p in pos[:10]] == expected_head


def test_golden_tail_and_inverse():
    pos = zigzag.diagonal_slices(8, 8, 8)
    assert tuple(pos[-1]) == (7, 7, 7)
    inv = zigzag.inverse_zigzag_flat_indices(8, 8, 8)
    flat = zigzag.zigzag_flat_indices(8, 8, 8)
    assert np.array_equal(flat[inv], np.arange(512))
    assert np.array_equal(inv[flat], np.arange(512))


def test_full_enumeration_matches_bruteforce():
    """Cross-check against a literal re-statement of the loop structure."""
    w = h = d = 8
    expected = []
    for target in range(22):
        for y in range(h):
            for z in range(d):
                for x in range(w):
                    if x + y + z == target:
                        expected.append((x, y, z))
    assert [tuple(p) for p in zigzag.diagonal_slices(w, h, d)] == expected

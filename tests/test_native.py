"""Native tensorizer parity + speed sanity vs the numpy fallbacks."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def lib_available():
    from fast_eng_super_resolution_tpu.data import native

    if not native.available():
        pytest.skip("native tensorizer unavailable (no compiler?)")
    return native


def test_native_edges_match_numpy(lib_available, rng):
    from fast_eng_super_resolution_tpu.data.native import cells_to_edges_native

    cells = rng.integers(0, 500, size=(300, 4)).astype(np.int64)
    native = cells_to_edges_native(cells)

    # numpy reference (the fallback path's math, inlined to avoid dispatch)
    iu, ju = np.triu_indices(4, 1)
    a = cells[:, iu].reshape(-1)
    b = cells[:, ju].reshape(-1)
    both = np.concatenate([np.stack([a, b], 1), np.stack([b, a], 1)])
    both = both[both[:, 0] != both[:, 1]]
    expected = np.unique(both, axis=0).astype(np.int32)

    np.testing.assert_array_equal(native, expected)


def test_native_rcb_balances_and_covers(lib_available, rng):
    from fast_eng_super_resolution_tpu.data.native import rcb_assign_native

    pts = rng.normal(size=(5000, 3))
    assign, boxes = rcb_assign_native(pts, 8)
    assert len(boxes) == 8
    counts = np.bincount(assign, minlength=8)
    assert counts.min() > 0
    assert counts.max() <= 1.3 * counts.min()
    # every point inside (or on the border of) its region's box
    for p in range(8):
        lo, hi = boxes[p]
        sel = pts[assign == p]
        assert np.all(sel >= lo - 1e-9) and np.all(sel <= hi + 1e-9)


def test_native_box_intersect(lib_available, rng):
    from fast_eng_super_resolution_tpu.data.native import (box_intersect_native,
                                                           rcb_assign_native)

    pts = rng.normal(size=(2000, 3))
    assign, boxes = rcb_assign_native(pts, 4)
    lo = pts - 0.05
    hi = pts + 0.05
    member = box_intersect_native(lo, hi, boxes)
    assert member.shape == (2000, 4)
    # own region always intersected
    assert member[np.arange(2000), assign].all()


def test_full_pipeline_uses_native_transparently(lib_available):
    """extract_subdomains must still satisfy the cover/partition invariants
    when the native RCB + edge extraction kick in."""
    from fast_eng_super_resolution_tpu.data.partition import extract_subdomains
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh

    mesh = make_duct_mesh(10, 5, 5)
    v, p = duct_field(mesh.points)
    y = np.concatenate([v, p], 1)
    subs = extract_subdomains(mesh.points, mesh.cells, y, y, 4, "all_intersecting")
    covered = np.unique(np.concatenate([s.global_node_ids for s in subs]))
    assert len(covered) == len(mesh.points)


def test_extract_all_matches_per_partition(lib_available, rng):
    """One-call extract_all must be bit-identical to per-partition
    extract_subdomain (same sorted gids, same receiver-major dedup'd edges),
    including empty partitions and duplicate node ids within a cell."""
    from fast_eng_super_resolution_tpu.data import native

    cells = rng.integers(0, 300, size=(500, 4)).astype(np.int64)
    cells[7, 1] = cells[7, 0]  # degenerate cell: repeated node
    lists = [rng.choice(500, size=int(rng.integers(1, 250)), replace=False)
             for _ in range(5)] + [np.empty(0, np.int64)]
    outs = native.extract_all_native(cells, 300, lists)
    assert outs is not None and len(outs) == len(lists)
    for cl, (g, e) in zip(lists, outs):
        if len(cl) == 0:
            assert len(g) == 0 and len(e) == 0
            continue
        rg, re_ = native.extract_subdomain_native(cells, cl)
        np.testing.assert_array_equal(g, rg)
        np.testing.assert_array_equal(e, re_)
        # receiver-major sortedness invariant relied on by the scatter path
        assert (np.diff(e[:, 1]) >= 0).all()


def test_overlap_tree_descent_matches_all_pairs(lib_available):
    """rcb_overlap_assign's cut-tree descent must produce exactly the
    all-pairs box-intersection membership (inclusive bounds), in ascending
    cell order per partition — including odd part counts (unbalanced tree)."""
    from fast_eng_super_resolution_tpu.data import native
    from fast_eng_super_resolution_tpu.data.synthetic import make_duct_mesh

    for dims, parts in [((10, 5, 5), 4), ((12, 6, 6), 16), ((8, 4, 4), 3)]:
        m = make_duct_mesh(*dims)
        lists, boxes = native.rcb_overlap_assign_native(m.points, m.cells,
                                                        parts, overlap=True)
        pts = m.points[m.cells]
        clo = pts.min(1).astype(np.float64)
        chi = pts.max(1).astype(np.float64)
        member = native.box_intersect_native(clo, chi, boxes)
        for p in range(parts):
            np.testing.assert_array_equal(np.sort(lists[p]),
                                          np.where(member[:, p])[0])
            if len(lists[p]):
                assert (np.diff(lists[p]) > 0).all()

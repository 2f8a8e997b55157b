"""Value- and property-level tests for operators/layout.py (Z-order
clustering stats). The DuckDB oracle covers cross-engine parity; these
pin the Morton arithmetic against plain Python and the locality claim
the op exists to demonstrate."""

from __future__ import annotations

import math

from angelone_clickhouse_spark.operators.layout import (
    Z_BITS,
    Z_FILES,
    Z_SPAN,
    zorder_layout,
)
from tests.conftest import SF_CORRECT


def _morton(x: int, y: int) -> int:
    z = 0
    for b in range(Z_BITS):
        z += ((x >> b) & 1) << (2 * b)
        z += ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_matches_python_reference(spark):
    """Recompute every row's lattice coords, Morton code, and file
    assignment in plain Python and compare the per-file rollup
    exactly."""
    rows = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .select("user_id", "value")
        .collect()
    )
    xs = [r.user_id for r in rows]
    ys = [math.floor(r.value * 100) for r in rows]
    x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
    top = (1 << Z_BITS) - 1
    files = {}
    for x, y in zip(xs, ys):
        xn = (x - x0) * top // max(1, x1 - x0)
        yn = (y - y0) * top // max(1, y1 - y0)
        fid = _morton(xn, yn) // Z_SPAN
        st = files.setdefault(fid, [0, x, x, y, y])
        st[0] += 1
        st[1] = min(st[1], x)
        st[2] = max(st[2], x)
        st[3] = min(st[3], y)
        st[4] = max(st[4], y)
    got = {r.file_id: r for r in zorder_layout(spark, SF_CORRECT).collect()}
    assert set(got) == set(files)
    for fid, (n, mnx, mxx, mny, mxy) in files.items():
        r = got[fid]
        assert (r.n_rows, r.min_user, r.max_user, r.min_value_c, r.max_value_c) == (
            n,
            mnx,
            mxx,
            mny,
            mxy,
        )
    assert sum(r.n_rows for r in got.values()) == len(rows)


def test_zorder_localizes_both_dimensions(spark):
    """The point of the curve: per-file spans must be narrow in BOTH
    dimensions simultaneously. A single-column sort bounds one
    dimension and leaves the other's per-file span at ~the full range;
    Z-order must beat half the range on average in each."""
    stats = zorder_layout(spark, SF_CORRECT).collect()
    assert 1 < len(stats) <= Z_FILES
    ux = [r for r in stats if r.n_rows > 1]
    full_u = max(r.max_user for r in stats) - min(r.min_user for r in stats)
    full_v = max(r.max_value_c for r in stats) - min(
        r.min_value_c for r in stats
    )
    avg_span_u = sum(r.max_user - r.min_user for r in ux) / len(ux)
    avg_span_v = sum(r.max_value_c - r.min_value_c for r in ux) / len(ux)
    assert avg_span_u < 0.5 * full_u
    assert avg_span_v < 0.5 * full_v


def test_prune_stats_show_zorder_payoff(spark):
    """The measurement op must reproduce the Z-order lesson on the
    fixture: (a) for a probe selective in the SECOND dimension only,
    the x-major layout prunes nothing (scans every file) while
    Z-order scans a small fraction; (b) for 2-D box probes Z-order
    scans no more files than x-major; (c) the pure-x band probe is
    the one place x-major may win (its own column is fully sorted);
    (d) scanned counts are bounded by n_files and every probe matches
    at least one row on this fixture."""
    from angelone_clickhouse_spark.operators.layout import (
        zorder_prune_stats,
    )

    rows = {
        r.probe_id: r
        for r in zorder_prune_stats(spark, SF_CORRECT).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    n_files = rows[1].n_files
    for r in rows.values():
        assert 0 < r.files_scanned_z <= n_files
        assert 0 < r.files_scanned_xsort <= n_files
        assert r.rows_matched > 0
    # (a) y-band probe: x-sort barely prunes (each file's y-range is
    # ~unconstrained; at tiny SFs a few sparse files can still miss
    # the band, so the bound is a large fraction rather than ==), z
    # prunes hard — at least 3x fewer files and under half the total
    assert rows[2].files_scanned_xsort > (2 * n_files) // 3
    assert rows[2].files_scanned_z * 3 <= rows[2].files_scanned_xsort
    assert rows[2].files_scanned_z < n_files // 2
    # (b) 2-D boxes: z never worse
    assert rows[3].files_scanned_z <= rows[3].files_scanned_xsort
    assert rows[4].files_scanned_z <= rows[4].files_scanned_xsort

"""Z-order clustered layout: file-skipping is measured, not assumed.

The value parity of ``events_zorder_box`` vs DuckDB rides in
tests/test_oracle_parity.py; these tests pin the layout's physical
properties — the point of Z-ordering is what the footer stats exclude.
"""

from __future__ import annotations

import glob
import io
import os
from contextlib import redirect_stdout

import pyarrow.parquet as pq
import pytest

from vectordb_from_scratch_spark.operators import layout


@pytest.fixture(scope="module")
def zpath(spark, sf_oracle):
    return layout.ensure_zorder(spark, sf_oracle)


def _file_stats(f: str):
    md = pq.ParquetFile(f).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    u = md.row_group(0).column(idx["user_id"]).statistics
    v = md.row_group(0).column(idx["value"]).statistics
    return (u.min, u.max), (v.min, v.max)


def test_zorder_files_skip_the_query_box(zpath):
    files = glob.glob(os.path.join(zpath, "*.parquet"))
    assert len(files) == layout.N_ZFILES
    (u0, u1), (v0, v1) = layout.ZBOX_USER, layout.ZBOX_VALUE
    skipped = 0
    for f in files:
        (ulo, uhi), (vlo, vhi) = _file_stats(f)
        if uhi < u0 or ulo > u1 or vhi < v0 or vlo > v1:
            skipped += 1
    # a random/unsorted layout gives ~0 skippable files for a box this
    # large (every file spans nearly the full range of both columns);
    # the Morton clustering must make at least a third of them skippable
    assert skipped >= layout.N_ZFILES // 3, f"only {skipped} files skippable"


def test_zorder_files_cover_compact_regions(zpath):
    # each file's user_id span must be well under the full domain —
    # i.e. the layout actually clusters, it doesn't just split by size
    files = glob.glob(os.path.join(zpath, "*.parquet"))
    spans = []
    for f in files:
        (ulo, uhi), _ = _file_stats(f)
        spans.append(uhi - ulo)
    full = max(uhi for (_, uhi) in [_file_stats(f)[0] for f in files])
    narrow = sum(1 for s in spans if s <= full // 2)
    assert narrow >= len(files) // 2, f"user_id spans too wide: {sorted(spans)}"


def test_zorder_box_pushes_both_range_predicates(spark, sf_oracle):
    df = layout.events_zorder_box(spark, sf_oracle)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "user_id" in pushed and "value" in pushed

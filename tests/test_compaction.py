"""On-disk compaction: 4 segments → 1, postings preserved, queries unchanged,
lineage records provenance (SURVEY §2.3 B8 operational path)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo/scripts")

from splade_spark.build.segments import SegmentedIndex, build_segmented_index, unpack_blocks
from splade_spark.config import DEFAULT
from splade_spark.fixtures import queries_df
from splade_spark.query.wand import topk_wand
from splade_spark.sources.web_pages import read_documents, web_pages_from_documents

from tests.conftest import SF_SMALL


def _hits(spark, idx):
    out = {}
    for r in topk_wand(
        queries_df(spark), idx.blocks(spark), idx.dictionary(spark), k=5, cfg=DEFAULT
    ).collect():
        out.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 6)))
    return {q: sorted(v) for q, v in out.items()}


def test_compact_preserves_postings_and_queries(spark, tmp_path):
    from compact_index import compact_index

    pages = web_pages_from_documents(read_documents(spark, SF_SMALL))
    idx_dir = str(tmp_path / "idx")
    idx = build_segmented_index(pages, idx_dir, DEFAULT, n_segments=4)
    assert sorted(idx.committed_segments()) == [0, 1, 2, 3]

    before_long = unpack_blocks(idx.blocks(spark)).select("term_id", "doc_id", "impact")
    before_rows = sorted(map(tuple, before_long.collect()))
    before_hits = _hits(spark, idx)

    res = compact_index(spark, idx_dir, target_segments=1)
    assert res["old_segments"] == 4 and res["new_segments"] == 1

    idx2 = SegmentedIndex(idx_dir)
    manifests = idx2.committed_segments()
    assert sorted(manifests) == [0]
    lineage = json.loads(manifests[0]["lineage"])
    assert lineage["compacted_from"] == [0, 1, 2, 3]

    after_long = unpack_blocks(idx2.blocks(spark)).select("term_id", "doc_id", "impact")
    assert sorted(map(tuple, after_long.collect())) == before_rows
    assert _hits(spark, idx2) == before_hits

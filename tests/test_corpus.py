"""Corpus determinism: byte-identical regardless of parallelism (needed
for the resume + scaling protocols, corpus.py docstring)."""

from __future__ import annotations

import numpy as np

from search_engine_spark.corpus import (
    NEEDLES,
    synthesize_transcripts,
    synthesize_transcripts_pd,
)


def _key(df):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"], r["ts"])
        for r in df.collect()
    }


def test_partition_invariance(spark):
    a = _key(synthesize_transcripts(spark, 120, partitions=2))
    b = _key(synthesize_transcripts(spark, 120, partitions=13))
    assert a == b


def test_matches_single_node_twin(spark):
    dist = _key(synthesize_transcripts(spark, 80, partitions=5))
    pdf = synthesize_transcripts_pd(80)
    local = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool, r.ts.to_pydatetime())
        for r in pdf.itertuples(index=False)
    }
    assert set(dist) == set(local)
    for k in dist:
        assert dist[k][:3] == local[k][:3], k
        # ts compared via naive UTC equality
        assert dist[k][3].replace(tzinfo=None) == local[k][3].replace(tzinfo=None)


def test_needles_planted(spark):
    pdf = synthesize_transcripts_pd(2000)
    hits = pdf[pdf["text"].str.contains("|".join(NEEDLES))]
    assert len(hits) > 0
    assert (hits["turn_idx"] == 1).all()

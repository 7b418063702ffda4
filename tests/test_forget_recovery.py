"""Crash-safe purge swaps (r12, ADVICE item 2).

The forget ops rewrite their store trees and swap them in. The r11 swap
order (``fs.delete(old)`` then ``fs.rename(next, old)``) had a wedge
window: a crash between the two calls leaves a marker-complete store
with the data directory MISSING, and re-runs skip the rebuild then fail
reading the absent path with no self-repair. r12 fixes it twice over:

* :func:`catalog.swap_subtrees` renames the live tree ASIDE before
  renaming the rewrite in (no crash point loses both copies), and
* every forget op validates the data directories ALONGSIDE the ready
  marker (:func:`catalog.store_intact`), so even a swap interrupted at
  the worst point re-heals by rebuilding instead of wedging.

These tests simulate the worst-point crash state directly (data dir
deleted, base marker still present, forget marker absent — exactly what
the old delete-first order left behind) and assert the op recovers and
serves the same rows.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from zylyty_data_engineer_challenge_spark.operators import cluster, lexical


@pytest.fixture()
def pair_cache(spark, tmp_path):
    spark.conf.set("spark.zylyty.pairCacheDir", str(tmp_path / "pair_cache"))
    try:
        yield str(tmp_path / "pair_cache")
    finally:
        spark.conf.unset("spark.zylyty.pairCacheDir")


def _lex_forget_base(spark, sf_dir) -> Path:
    return Path(lexical._lex_dir(spark, sf_dir, tag="bm25-forget"))


def _labels_forget_base(spark, sf_dir) -> Path:
    from zylyty_data_engineer_challenge_spark.operators.dedup import (
        _pair_cache_dir,
    )

    return Path(
        _pair_cache_dir(
            spark, sf_dir, modality="lloyd-forget", src="embeddings.parquet"
        )
    )


def test_bm25_forget_reheals_after_interrupted_swap(spark, sf_dir, pair_cache):
    want = [tuple(r) for r in lexical.bm25_index_forget(spark, sf_dir).collect()]
    base = _lex_forget_base(spark, sf_dir)

    # worst-point crash state the old delete-first swap could leave:
    # postings gone, markers claiming the base is ready and (half) purged
    shutil.rmtree(base / "postings")
    (base / "_FORGET_READY").unlink(missing_ok=True)

    got = [tuple(r) for r in lexical.bm25_index_forget(spark, sf_dir).collect()]
    assert got == want
    assert (base / "postings").exists()
    assert not (base / "postings_trash").exists()
    assert not (base / "postings_next").exists()


def test_bm25_forget_reheals_even_with_stale_forget_marker(
    spark, sf_dir, pair_cache
):
    """If the crash landed AFTER the forget marker was written but a data
    tree is missing (marker-complete, dir-gone — the unrecoverable state
    of the r11 order), store_intact must still trigger the rebuild and
    the re-heal must re-run the purge (the stale marker is cleared)."""
    want = [tuple(r) for r in lexical.bm25_index_forget(spark, sf_dir).collect()]
    base = _lex_forget_base(spark, sf_dir)

    shutil.rmtree(base / "doclens")  # marker still present

    got = [tuple(r) for r in lexical.bm25_index_forget(spark, sf_dir).collect()]
    assert got == want
    assert (base / "doclens").exists()


def test_cluster_labels_forget_reheals_after_interrupted_swap(
    spark, sf_dir, pair_cache
):
    want = [tuple(r) for r in cluster.cluster_labels_forget(spark, sf_dir).collect()]
    base = _labels_forget_base(spark, sf_dir)

    shutil.rmtree(base / "labels")
    (base / "_FORGET_READY").unlink(missing_ok=True)

    got = [tuple(r) for r in cluster.cluster_labels_forget(spark, sf_dir).collect()]
    assert got == want
    assert (base / "labels").exists()
    assert not (base / "labels_trash").exists()


def test_swap_subtrees_never_deletes_before_rename(spark, tmp_path):
    """The swap itself: live tree replaced by _next via rename-aside —
    and debris from a previously interrupted swap is cleared."""
    from zylyty_data_engineer_challenge_spark.catalog import swap_subtrees

    base = tmp_path / "store"
    (base / "data").mkdir(parents=True)
    (base / "data" / "old.txt").write_text("old")
    (base / "data_next").mkdir()
    (base / "data_next" / "new.txt").write_text("new")
    # debris from an interrupted previous swap
    (base / "data_trash").mkdir()
    (base / "data_trash" / "stale.txt").write_text("stale")

    swap_subtrees(spark, str(base), ("data",))

    assert (base / "data" / "new.txt").read_text() == "new"
    assert not (base / "data_next").exists()
    assert not (base / "data_trash").exists()

"""Generation-based state store: crash-safety and reader-survival.

The reference's HBase store gets durability from the region server; our
parquet store must provide it itself (SURVEY.md §4 custom-work item 1).
Contract under test:
  - save() commits via atomic CURRENT-pointer replace (os.replace)
  - a crash BEFORE the pointer swap leaves the previous state readable
  - DataFrames loaded before a save still resolve after it (the old
    generation survives one cycle)
  - legacy flat parquet layouts migrate in place
"""

from __future__ import annotations

import os
from unittest import mock

import pytest

from hogzilla_spark.schemas import HISTOGRAMS
from hogzilla_spark.state import store


def _mk_state(spark, names):
    return spark.createDataFrame(
        [(n, 10, {"80": 1.0}, {}) for n in names], HISTOGRAMS
    )


def _gens(path):
    return sorted(n for n in os.listdir(path) if n.startswith("gen-"))


def test_save_load_roundtrip(spark, tmp_path):
    path = str(tmp_path / "st")
    store.save(_mk_state(spark, ["HIST01-a", "HIST01-b"]), path)
    assert store.load(spark, path).count() == 2
    assert len(_gens(path)) == 1
    assert store._current_gen(path) in _gens(path)


def test_load_missing_is_empty(spark, tmp_path):
    assert store.load(spark, str(tmp_path / "nope")).count() == 0


def test_lazy_reader_survives_swap(spark, tmp_path):
    """The round-1 bug: plans built against the old files must still
    resolve after save() commits a new generation."""
    path = str(tmp_path / "st")
    store.save(_mk_state(spark, ["HIST01-a"]), path)
    old = store.load(spark, path)  # lazy — no action yet
    store.save(_mk_state(spark, ["HIST01-a", "HIST01-b"]), path)
    assert old.count() == 1  # reads the kept previous generation
    assert store.load(spark, path).count() == 2


def test_gc_keeps_exactly_two_generations(spark, tmp_path):
    path = str(tmp_path / "st")
    for i in range(4):
        store.save(_mk_state(spark, [f"HIST01-{j}" for j in range(i + 1)]), path)
    assert len(_gens(path)) == 2
    assert store.load(spark, path).count() == 4


def test_crash_before_pointer_swap_preserves_state(spark, tmp_path):
    """Kill the save between the parquet write and the CURRENT replace:
    the store must still serve the previous generation."""
    path = str(tmp_path / "st")
    store.save(_mk_state(spark, ["HIST01-a"]), path)
    before = store._current_gen(path)

    with mock.patch.object(store.os, "replace", side_effect=OSError("crash")):
        with pytest.raises(OSError):
            store.save(_mk_state(spark, ["HIST01-a", "HIST01-b"]), path)

    assert store._current_gen(path) == before
    assert store.load(spark, path).count() == 1
    # recovery: the next save succeeds and cleans the orphan gen + tmp
    store.save(_mk_state(spark, ["HIST01-a", "HIST01-b", "HIST01-c"]), path)
    assert store.load(spark, path).count() == 3
    assert not [n for n in os.listdir(path) if n.startswith("CURRENT.tmp-")]


def test_legacy_flat_layout_migrates(spark, tmp_path):
    """Stores written before the generation scheme (plain parquet dir)
    load as-is and upgrade on the first save."""
    path = str(tmp_path / "st")
    _mk_state(spark, ["HIST01-a"]).write.parquet(path)
    assert store._current_gen(path) is None
    assert store.load(spark, path).count() == 1

    old = store.load(spark, path)
    store.save(_mk_state(spark, ["HIST01-a", "HIST01-b"]), path)
    assert old.count() == 1  # legacy files kept one cycle
    assert store.load(spark, path).count() == 2
    # second generational save clears the flat legacy files
    store.save(_mk_state(spark, ["HIST01-a", "HIST01-b", "HIST01-c"]), path)
    assert not [n for n in os.listdir(path) if n.startswith("part-")]
    assert store.load(spark, path).count() == 3

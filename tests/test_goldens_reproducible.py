"""Golden regeneration is byte-stable: running the generator again
must reproduce the frozen fixtures exactly. Guards every kernel on the
golden path against accidental nondeterminism (dict ordering, set
iteration, float formatting) — the same guarantee the Spark pipeline
is held to, applied to the single-node oracle itself."""

import filecmp
import os

from pdf_extractor_spark.sources.pages import (build_extra_records,
                                               build_pages_records)
from tools.make_goldens import (CLEANED_DIR, EXTRA_DIR, EXTRA_N,
                                EXTRA_SEED, GOLDEN_N, GOLDEN_SEED,
                                OUT_DIR, _write_family)


def _assert_identical(frozen_dir, fresh_dir):
    frozen = sorted(os.listdir(frozen_dir))
    fresh = sorted(os.listdir(fresh_dir))
    assert frozen == fresh
    for name in frozen:
        assert filecmp.cmp(os.path.join(frozen_dir, name),
                           os.path.join(fresh_dir, name),
                           shallow=False), f"golden drifted: {name}"


def test_primary_family_reproducible(tmp_path):
    out = str(tmp_path / "goldens")
    _write_family(build_pages_records(GOLDEN_N, GOLDEN_SEED), out)
    _assert_identical(OUT_DIR, out)


def test_extra_family_reproducible(tmp_path):
    out = str(tmp_path / "extra")
    _write_family(build_extra_records(EXTRA_N, EXTRA_SEED), out)
    _assert_identical(EXTRA_DIR, out)


def test_cleaned_family_reproducible(tmp_path):
    out = str(tmp_path / "cleaned")
    _write_family(build_pages_records(GOLDEN_N, GOLDEN_SEED), out,
                  levels=("raw",), text_cleaning="light")
    _assert_identical(CLEANED_DIR, out)

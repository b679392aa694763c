"""Crawl-snapshot diff (stages/crawldiff.py): all four statuses,
digest honesty, duplicate-key collapse, layout invariance."""

from __future__ import annotations

import ray.data as rd

from ocrd_cis_ray.stages.crawldiff import sha256_digests, snapshot_diff


def _snap(rows):
    return rd.from_items(
        [{"urlkey": k, "digest": sha256_digests([t])[0]} for k, t in rows]
    )


def test_all_four_statuses():
    old = _snap([("a", "x"), ("b", "y"), ("c", "z")])
    new = _snap([("a", "x"), ("b", "y2"), ("d", "w")])
    out = (
        snapshot_diff(old, new).to_pandas()
        .set_index("urlkey")["status"].to_dict()
    )
    assert out == {"a": "unchanged", "b": "changed", "c": "gone", "d": "new"}


def test_identical_text_different_keys_not_confused():
    # same digest under different keys must not collapse
    old = _snap([("a", "same"), ("b", "same")])
    new = _snap([("a", "same")])
    out = (
        snapshot_diff(old, new).to_pandas()
        .set_index("urlkey")["status"].to_dict()
    )
    assert out == {"a": "unchanged", "b": "gone"}


def test_duplicate_keys_within_snapshot_collapse_to_first():
    old = rd.from_items(
        [{"urlkey": "a", "digest": "d1"}, {"urlkey": "a", "digest": "d2"}]
    )
    new = rd.from_items([{"urlkey": "a", "digest": "d1"}])
    out = snapshot_diff(old, new).to_pandas()
    assert len(out) == 1 and out.loc[0, "status"] == "unchanged"


def test_layout_invariance():
    rows_old = [(f"k{i}", f"t{i}") for i in range(60)]
    rows_new = [(f"k{i}", f"t{i}" + (" v2" if i % 3 == 0 else ""))
                for i in range(5, 65)]
    a = snapshot_diff(
        _snap(rows_old).repartition(1), _snap(rows_new).repartition(1)
    ).to_pandas().sort_values("urlkey").reset_index(drop=True)
    b = snapshot_diff(
        _snap(rows_old).repartition(7), _snap(rows_new).repartition(3)
    ).to_pandas().sort_values("urlkey").reset_index(drop=True)
    assert a.equals(b)
    assert set(a["status"]) == {"new", "gone", "changed", "unchanged"}

"""Registry-contract regression tests.

The driver derives ``queries()`` / ``oracle_sql()`` from the registry,
so the registry IS the correctness surface: these tests pin its size and
its fail-loud import behavior so a broken plan module can never silently
shrink the contract (a swallowed ImportError would present as "fewer
features", not an error — the exact failure mode VERDICT r01 flagged).
"""

from __future__ import annotations

import inspect

from hadoop_lab_spark.plans import registry
from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules

load_all_query_modules()

#: Update this constant in the SAME commit that registers a new query.
#: An exact count (not >=) also catches accidental de-registration.
EXPECTED_QUERIES = 160


def test_registry_exact_size():
    assert len(REGISTRY) == EXPECTED_QUERIES, sorted(REGISTRY)


def test_every_query_has_doc_and_tags():
    for name, spec in REGISTRY.items():
        assert spec.doc.strip(), f"{name} has no doc"
        assert spec.tags, f"{name} has no tags"


def test_loader_has_no_import_swallowing():
    """The loader must not contain try/except around plan imports —
    a broken module has to crash the contract, not shrink it."""
    src = inspect.getsource(registry.load_all_query_modules)
    assert "except" not in src, src


def test_rotation_puts_unverified_queries_first():
    """The driver caps CORRECTNESS at the first 50 ``queries()`` entries,
    so emission order must put never-driver-green queries first and
    least-recently-green next — otherwise registered queries silently
    starve of driver verification (VERDICT r02 finding #2). Lanes whose
    pinned plan digest changed since their last green round count as
    never-green (VERDICT r9 task #4)."""
    import __spark_entry__ as e

    order = list(e.queries())
    assert set(order) == set(REGISTRY)
    seen = e._last_green_round()
    for name in e._digest_changed_lanes(seen):
        seen.pop(name, None)
    ranks = [seen.get(n, 0) for n in order]
    assert ranks == sorted(ranks), "queries() not ordered by last green round"


def test_rotation_digest_change_forces_reverification(monkeypatch):
    """A lane recomposed AFTER its green row must jump to the window
    head: the green row verified code that no longer exists. The r9
    ingest lane shipped a 10x-regressed recompose that the driver never
    re-verified because rotation keyed on last-green-round alone
    (VERDICT r9 'What's missing' #3)."""
    import __spark_entry__ as e

    seen = e._last_green_round()
    # Pick a lane with a green row that would normally sort mid-pack.
    victim = max(seen, key=lambda n: (seen[n], n))
    assert seen[victim] > 0
    monkeypatch.setattr(e, "_digest_changed_lanes", lambda s: {victim})
    order = e._rotation_order()
    never_green = {n for n in REGISTRY if n not in seen or n == victim}
    head = set(order[: len(never_green)])
    assert victim in head, (
        f"digest-changed lane {victim} did not sort as never-green"
    )


def _scratch_repo(tmp_path):
    import subprocess

    repo = tmp_path / "repo"
    repo.mkdir()

    def git(*args):
        subprocess.run(
            ["git", *args], cwd=repo, check=True, capture_output=True
        )

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    return repo, git


def test_digest_changed_lanes_detects_a_bumped_pin(tmp_path):
    """End-to-end on a scratch git repo: commit a CORRECTNESS file and a
    digest pin together (the driver's round commit), then change the
    working-tree pin. Same normalizer version: BOTH a skeleton flip and
    a detail-level (full-text-only) change must flag — the r9 advisor's
    blind spot was exactly the detail class (changed join keys, lost
    PushedFilters) keeping a stale green row (ADVICE r10)."""
    import json as _json

    import __spark_entry__ as e

    repo, git = _scratch_repo(tmp_path)
    pins = {
        "normalizer_version": 2,
        "lanes": {
            "lane_a": {"digest": "aaa", "skeleton_digest": "sa"},
            "lane_b": {"digest": "bbb", "skeleton_digest": "sb"},
            "lane_c": {"digest": "ccc", "skeleton_digest": "sc"},
        },
    }
    (repo / "plan_digests.json").write_text(_json.dumps(pins))
    (repo / "CORRECTNESS_r01.json").write_text(
        _json.dumps({n: {"hash_match": True} for n in ("lane_a", "lane_b", "lane_c")})
    )
    git("add", "-A")
    git("commit", "-q", "-m", "round 1")
    # lane_a: structural change (skeleton flips). lane_b: detail-level
    # change (full text only — e.g. a lost PushedFilters). lane_c:
    # untouched.
    pins["lanes"]["lane_a"]["skeleton_digest"] = "CHANGED"
    pins["lanes"]["lane_a"]["digest"] = "CHANGED"
    pins["lanes"]["lane_b"]["digest"] = "detail-drift"
    (repo / "plan_digests.json").write_text(_json.dumps(pins))
    changed = e._digest_changed_lanes(
        {"lane_a": 1, "lane_b": 1, "lane_c": 1}, repo_dir=str(repo)
    )
    assert changed == {"lane_a", "lane_b"}


def test_digest_changed_lanes_skeleton_fallback_across_normalizer_versions(
    tmp_path,
):
    """A normalizer-version bump re-hashes every lane's full text while
    changing zero plans (the r10 canonical-list-order change hit 147
    lanes) — across versions only a skeleton flip may flag, or a
    format-evolution re-pin would mark the whole registry unverified."""
    import json as _json

    import __spark_entry__ as e

    repo, git = _scratch_repo(tmp_path)
    pins = {
        # no normalizer_version: a pre-r11 pin
        "lanes": {
            "lane_a": {"digest": "aaa", "skeleton_digest": "sa"},
            "lane_b": {"digest": "bbb", "skeleton_digest": "sb"},
        },
    }
    (repo / "plan_digests.json").write_text(_json.dumps(pins))
    (repo / "CORRECTNESS_r01.json").write_text(
        _json.dumps({"lane_a": {"hash_match": True}, "lane_b": {"hash_match": True}})
    )
    git("add", "-A")
    git("commit", "-q", "-m", "round 1")
    new_pins = {
        "normalizer_version": 2,
        "lanes": {
            # every full text re-hashed by the format evolution...
            "lane_a": {"digest": "v2-aaa", "skeleton_digest": "sa"},
            # ...but lane_b ALSO changed structurally
            "lane_b": {"digest": "v2-bbb", "skeleton_digest": "FLIPPED"},
        },
    }
    (repo / "plan_digests.json").write_text(_json.dumps(new_pins))
    changed = e._digest_changed_lanes(
        {"lane_a": 1, "lane_b": 1}, repo_dir=str(repo)
    )
    assert changed == {"lane_b"}


def test_digest_changed_lanes_works_during_the_inround_window(tmp_path):
    """ADVICE r10: while a round's CORRECTNESS file is still UNTRACKED
    (exactly the window when a lane is most likely freshly recomposed),
    the guard must resolve the historical pin from the last commit
    touching plan_digests.json instead of going inert."""
    import json as _json

    import __spark_entry__ as e

    repo, git = _scratch_repo(tmp_path)
    pins = {
        "normalizer_version": 2,
        "lanes": {"lane_a": {"digest": "aaa", "skeleton_digest": "sa"}},
    }
    (repo / "plan_digests.json").write_text(_json.dumps(pins))
    (repo / "CORRECTNESS_r01.json").write_text(
        _json.dumps({"lane_a": {"hash_match": True}})
    )
    git("add", "-A")
    git("commit", "-q", "-m", "round 1")
    # Round 2 in progress: its CORRECTNESS file exists but is untracked,
    # lane_a greened in it, and the lane was then recomposed in-round.
    (repo / "CORRECTNESS_r02.json").write_text(
        _json.dumps({"lane_a": {"hash_match": True}})
    )
    pins["lanes"]["lane_a"] = {"digest": "RECOMPOSED", "skeleton_digest": "RE"}
    (repo / "plan_digests.json").write_text(_json.dumps(pins))
    changed = e._digest_changed_lanes({"lane_a": 2}, repo_dir=str(repo))
    assert changed == {"lane_a"}


def test_oracle_alias_parity():
    """Every oracle is non-empty SQL mentioning at least one FROM —
    cheap sanity that a refactor didn't blank a string."""
    for name, spec in REGISTRY.items():
        if spec.oracle is not None:
            assert "FROM" in spec.oracle.upper(), name

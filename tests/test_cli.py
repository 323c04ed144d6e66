"""CLI end-to-end tests, including URL input acquisition (the one
``./Lab.sh`` behavior a drop-in reference user would miss — VERDICT r01
gap #2). The run-lab invocation goes through a real subprocess so the
CLI owns (and stops) its own SparkSession without touching the shared
test fixture session."""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

from hadoop_lab_spark.__main__ import _fetch_input

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
REPO = pathlib.Path(__file__).parent.parent


def _pkg_env() -> dict[str, str]:
    """Subprocess env that makes the package importable WITHOUT relying
    on the child's cwd (VERDICT r6 #4: no test may depend on repo-root
    cwd). A pip-installed checkout doesn't need the PYTHONPATH entry,
    but the tests must also pass straight out of a git clone."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_fetch_input_passthrough_local_path():
    assert _fetch_input("/some/local/file.txt") == "/some/local/file.txt"
    # windows-style or colon-bearing non-URL strings also pass through
    assert _fetch_input("relative/path.csv") == "relative/path.csv"


def test_fetch_input_downloads_file_url(tmp_path):
    src = FIXTURES / "lab2_words.txt"
    local = _fetch_input(src.resolve().as_uri())
    assert local != str(src)
    assert pathlib.Path(local).read_bytes() == src.read_bytes()


def test_run_lab_accepts_file_url(tmp_path):
    """Full e2e: `python -m hadoop_lab_spark run-lab 2 file://...` must
    download, run, and write the reference-shaped output."""
    out = tmp_path / "out"
    src = (FIXTURES / "lab2_words.txt").resolve().as_uri()
    proc = subprocess.run(
        [sys.executable, "-m", "hadoop_lab_spark", "run-lab", "2", src, "-o", str(out)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
        env=_pkg_env(),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    part = out / "part-r-00000"
    assert part.exists()
    lines = part.read_text().splitlines()
    assert lines == sorted(lines)  # key-sorted, reference shape
    assert all("\t" in l for l in lines)


def test_sql_subcommand_runs_over_registered_views():
    """`python -m hadoop_lab_spark sql "SELECT ..."` — the ad-hoc SQL
    layer over the pre-registered star-schema views."""
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "hadoop_lab_spark",
            "sql",
            "SELECT r_name, count(*) AS n FROM region "
            "GROUP BY r_name ORDER BY r_name",
            "--sf-dir",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/tmp",
        env=_pkg_env(),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "r_name" in proc.stdout
    # region has 5 fixed rows at every scale factor
    assert proc.stdout.count("| 1 ") >= 5 or "AFRICA" in proc.stdout


def test_sweep_scale_tool_runs_and_reports(tmp_path):
    """tools/sweep_scale.py is the committed 10x-sweep harness
    (PERFORMANCE.md r5): one subprocess run on two cheap lanes at
    sf0.001 must produce MATCH rows, a JSON detail file, and exit 0."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools", "sweep_scale.py"),
            "/root/testdata/sf0.001",
            "--only=wordcount,count_per_priority",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "DIFF wordcount: MATCH" in out.stdout
    assert "DIFF count_per_priority: MATCH" in out.stdout
    detail = json.load(open("/tmp/sweep_sf0.001.json"))
    assert detail["failed"] == []
    assert detail["results"]["wordcount"]["diff"] == "MATCH"
    assert detail["results"]["wordcount"]["sec"] is not None

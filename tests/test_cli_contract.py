"""CLI contract tests — models the reference's subprocess-spawned CLI
checks (/root/reference/tests/unit/test_cli_subcommands.py:31-125:
help text, argument validation, exit codes). No Spark session needed."""

from __future__ import annotations

import subprocess
import sys

CLI = [sys.executable, "-m", "mistral_ocr_spark.cli"]


def _run(*args):
    return subprocess.run([*CLI, *args], capture_output=True, text=True, timeout=60)


def test_no_verb_fails():
    r = _run()
    assert r.returncode != 0
    assert "usage" in (r.stderr + r.stdout).lower()


def test_help_lists_verbs():
    r = _run("--help")
    assert r.returncode == 0
    for verb in ("submit", "status", "results", "search", "list", "files"):
        assert verb in r.stdout


def test_unknown_verb_fails():
    assert _run("frobnicate").returncode != 0


def test_submit_requires_table():
    r = _run("submit")
    assert r.returncode != 0
    assert "--table" in r.stderr


def test_search_requires_query():
    r = _run("search", "--table", "/tmp/nope")
    assert r.returncode != 0
    assert "--query" in r.stderr


def test_files_on_missing_table_is_empty_manifest():
    r = _run("files", "--table", "/tmp/definitely_missing_ocr_table")
    assert r.returncode == 0
    assert '"snapshot_id": 0' in r.stdout

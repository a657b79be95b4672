"""Live-JDBC integration: the JdbcDatabase path against real DuckDB files.

Runs ``scripts/jdbc_e2e.py`` in a SUBPROCESS because the JDBC driver jar
must be on ``spark.jars`` at JVM start — the session-scoped test
SparkSession can't take it on after the fact. Skips when no driver jar is
present locally (the jar is the public ``org.duckdb:duckdb_jdbc`` Maven
artifact; any local Maven/Coursier cache copy works).
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JAR_GLOBS = [
    "~/.cache/coursier/**/duckdb_jdbc*.jar",
    "~/.m2/**/duckdb_jdbc*.jar",
    "~/.ivy2/**/duckdb_jdbc*.jar",
]


def _find_driver_jar() -> str | None:
    for pattern in _JAR_GLOBS:
        hits = glob.glob(os.path.expanduser(pattern), recursive=True)
        if hits:
            return sorted(hits)[-1]
    return None


def test_jdbc_e2e_duckdb_files(sf_dir):
    jar = _find_driver_jar()
    if jar is None:
        pytest.skip("no duckdb_jdbc driver jar in local Maven/Coursier caches")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "jdbc_e2e.py"), jar, sf_dir],
        capture_output=True,
        text=True,
        timeout=280,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-2000:]}"
    assert "JDBC_E2E_ALL_OK" in proc.stdout

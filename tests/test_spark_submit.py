"""Ship-shape test (north_rule): the flagship runs via
`spark-submit --py-files osmgraft.zip` from OUTSIDE the repo
directory (so only the zip provides the package), writes through
the manifest, and resumes idempotently."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


def _spark_submit() -> str:
    import pyspark

    return os.path.join(pyspark.__path__[0], "bin", "spark-submit")


@pytest.mark.skipif(
    not os.path.exists(_spark_submit()),
    reason="spark-submit not found",
)
def test_spark_submit_pyfiles(spark, tmp_path):
    from osmgraft.pages import synth_pages
    from tools.make_pyfiles import build

    pages_path = str(tmp_path / "pages")
    synth_pages(spark, 2000, partitions=4).write.parquet(pages_path)
    zip_path = build(str(tmp_path / "osmgraft.zip"))
    out_dir = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    env["PYSPARK_PYTHON"] = sys.executable

    def run():
        return subprocess.run(
            [
                _spark_submit(),
                "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                "/root/repo/tools/submit_flagship.py",
                pages_path, out_dir, "8", "4",
            ],
            cwd=str(tmp_path),  # NOT the repo dir
            env=env,
            capture_output=True,
            text=True,
            timeout=420,
        )

    r1 = run()
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "2 commit group(s)" in r1.stdout

    # second run is a no-op resume
    r2 = run()
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "0 commit group(s)" in r2.stdout

    # committed output is complete and readable
    from osmgraft.manifest import read_committed, verify_manifest

    final = read_committed(spark, out_dir)
    assert final.count() > 0
    assert set(final.columns) >= {
        "url", "cell", "region", "subregion", "bucket",
    }
    assert verify_manifest(spark, out_dir).isEmpty()

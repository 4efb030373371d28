"""The executor-shipped package zip must be importable in a clean
process, INCLUDING the import-time resource loads (r14 inherited-state
fix: functions/text.py reads the PSL rule file when the module is
imported; the old plain-path open() raised NotADirectoryError from the
zip, killing every Python worker whose driver ran outside the repo)."""

from __future__ import annotations

import os
import subprocess
import sys


def test_zip_import_loads_resources(tmp_path):
    from alma_memory_spark.session import build_package_zip

    zpath = build_package_zip(str(tmp_path / "pkg.zip"))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from alma_memory_spark.functions import text\n"
        "assert text.PSL_RULES['exact'], 'PSL rules empty from zip'\n"
        "from alma_memory_spark.functions import bpe\n"
        "assert bpe.load_merge_ranks(), 'BPE merges empty from zip'\n"
        "print('ok')\n" % zpath
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout


def test_zip_contains_resource_files(tmp_path):
    import zipfile

    from alma_memory_spark.session import build_package_zip

    zpath = build_package_zip(str(tmp_path / "pkg.zip"))
    names = set(zipfile.ZipFile(zpath).namelist())
    assert "alma_memory_spark/resources/public_suffix_list.dat" in names
    assert "alma_memory_spark/resources/bpe_merges.txt" in names

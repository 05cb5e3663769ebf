"""Ship the repo's python packages to executors (SURVEY.md §3.2:
``spark-submit --py-files kg.zip`` is the cluster deployment story;
``ensure_py_files`` is the programmatic equivalent so the pipeline works no
matter how the SparkSession was created or what the driver CWD is —
pandas-UDF workers unpickle ``ner_spark.*`` by module name and need the
package on their import path)."""

from __future__ import annotations

import os
import tempfile
import zipfile

_DONE: set[str] = set()
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PACKAGES = ("ner_spark", "fixtures", "oracle")


def build_pyfiles_zip(path: str | None = None) -> str:
    """Zip the repo packages (idempotent); also usable for --py-files."""
    path = path or os.path.join(tempfile.gettempdir(), f"ner_spark_pyfiles_{os.getuid()}.zip")
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w") as z:
        for pkg in _PACKAGES:
            pdir = os.path.join(REPO_ROOT, pkg)
            for dirpath, _dirs, files in os.walk(pdir):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, REPO_ROOT))
    os.replace(tmp, path)
    return path


def ensure_py_files(spark) -> None:
    """addPyFile the package zip once per SparkContext."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _DONE:
        return
    sc.addPyFile(build_pyfiles_zip())
    _DONE.add(app)

"""The docs site must build from the checked-in markdown sources."""

import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_docs_site_builds(tmp_path):
    sys.path.insert(0, str(ROOT / "docs"))
    try:
        import build_site
    finally:
        sys.path.pop(0)
    n = build_site.build(tmp_path)
    assert n == len(build_site.PAGES)
    index = (tmp_path / "index.html").read_text()
    assert "stgraph-tpu" in index
    assert (tmp_path / "api.html").stat().st_size > 10_000


def test_project_files_exist():
    for name in ("LICENSE", "INSTALLATION.md", "CONTRIBUTING.md",
                 "CITATION.cff"):
        assert (ROOT / name).exists(), name
    assert "MIT" in (ROOT / "LICENSE").read_text()

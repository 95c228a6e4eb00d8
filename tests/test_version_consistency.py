"""Version single-sourcing: the root pyproject, the Poetry packaging
variant, and the importable ``__version__`` must all agree.

Round-7 ADVICE flagged three drifting version sources (root pyproject
0.6.0, poetry variant 0.6.0 "keep in sync" comment, __init__ 0.1.0);
__version__ is now derived from distribution metadata / the root
pyproject (python_tool_setup_spark/__init__.py::_resolve_version) and
this test pins the two pyproject files to each other.
"""

from __future__ import annotations

import os
import tomllib

import python_tool_setup_spark as pkg

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _project_version(path: str) -> str:
    with open(path, "rb") as fh:
        return tomllib.load(fh)["project"]["version"]


def test_pyproject_files_agree():
    root_v = _project_version(os.path.join(ROOT, "pyproject.toml"))
    poetry_v = _project_version(
        os.path.join(ROOT, "packaging", "poetry", "pyproject.toml")
    )
    assert root_v == poetry_v, (
        f"root pyproject {root_v} != poetry packaging variant {poetry_v}"
    )


def test_dunder_version_matches_pyproject():
    root_v = _project_version(os.path.join(ROOT, "pyproject.toml"))
    assert pkg.__version__ == root_v

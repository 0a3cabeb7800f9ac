"""Benchmark-instance root resolution.

The parity/bench suites solve the instance files bundled with the
reference repository (xgillard/ddo's `resources/` tree).  Outside this
environment, clone the reference and point DDO_RESOURCES at its
resources directory:

    git clone https://github.com/xgillard/ddo
    export DDO_RESOURCES=/path/to/ddo/resources
"""

from __future__ import annotations

import os

#: default matches the read-only mount used during development
DEFAULT_ROOT = "/root/reference/resources"


def resources_root() -> str:
    return os.environ.get("DDO_RESOURCES", DEFAULT_ROOT)

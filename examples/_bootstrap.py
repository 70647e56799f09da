"""Make the example CLIs runnable without an installed package.

The repo is normally installed editable, but environment resets can wipe
the venv's site-packages entry while leaving the tree intact.  Importing
this module (it lives next to every example, so the script directory puts
it on ``sys.path``) prepends the repo root when the package cannot be
found, keeping ``python examples/<cli>.py`` self-contained.
"""

import os
import sys

try:
    import flow_guided_krylov_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

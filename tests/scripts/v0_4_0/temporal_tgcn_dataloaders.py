"""v0.4.0 testpack: TGCN training over all six temporal dataloaders.

Delegates to the maintained pack (``tests/scripts/stgraph_script.py``)
and records this release's logs under ``v0_4_0/outputs/``.
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, os.path.abspath(os.path.join(HERE, "..", "..", "..")))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import stgraph_script  # noqa: E402

stgraph_script.OUT_DIR = os.path.join(HERE, "outputs")

if __name__ == "__main__":
    res = stgraph_script.run_temporal_pack()
    print("temporal pack:", res)

"""Regenerate the committed golden stems (tests/golden/*.npz).

Run deliberately after an INTENDED behavior change; tests/test_golden.py
pins every case. Always generates on the simulated CPU backend so goldens
are reproducible in CI.

    python tools/gen_golden.py            # all cases
    python tools/gen_golden.py ikala_tiny_stems chunked_int16_tiny_stems
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.golden_cases import CASES  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)


def main(names):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in names or CASES:
        data = CASES[name]()
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, **data)
        stems = data["stems"]
        print(
            f"golden written {path}: stems {stems.shape} {stems.dtype} "
            f"mean|x|={float(np.abs(stems.astype(np.float64)).mean()):.5g}"
        )


if __name__ == "__main__":
    main(sys.argv[1:])

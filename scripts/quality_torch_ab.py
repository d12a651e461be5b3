"""Same-data training A/B vs the reference torch implementation — table
generator for docs/PERFORMANCE.md (the test version lives in
tests/train/test_torch_training_parity.py). CPU, fp32."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np


def main():
    import pytest

    class Capture:
        table = None

    # run the actual test with instrumentation via env
    os.environ["RAYGUN_PARITY_TABLE"] = "/tmp/parity_table.json"
    rc = pytest.main(["-x", "-q",
                      "tests/train/test_torch_training_parity.py"])
    import json
    with open("/tmp/parity_table.json") as f:
        d = json.load(f)
    j, t = np.asarray(d["jax"]), np.asarray(d["torch"])
    rel = np.abs(j - t) / np.maximum(t, 1e-6)
    print("| step | ours (JAX/TPU-native) | reference torch | rel diff |")
    print("|---|---|---|---|")
    for i in [0, 1, 4, 9, 19, 39, 59, 79]:
        print(f"| {i+1} | {j[i]:.5f} | {t[i]:.5f} | {rel[i]*100:.2f}% |")
    print(f"| mean 1-20 | {j[:20].mean():.5f} | {t[:20].mean():.5f} | — |")
    print(f"| mean 61-80 | {j[-20:].mean():.5f} | {t[-20:].mean():.5f} | — |")
    print(f"max relative divergence over 80 steps: {rel.max()*100:.2f}%")
    return rc


if __name__ == "__main__":
    sys.exit(main())

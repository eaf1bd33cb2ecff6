"""Dev: end-to-end CLI run ON THE REAL TPU with the production fast path.

Builds a synthetic dataset dir, then shells the actual CLIs:
    train (--conv-impl fused --compute-dtype bfloat16) → predict → evaluate
This is the hardware analogue of tests/test_smoke.py (which runs on CPU):
it exercises the eproj Pallas kernels, bf16 windows, scan-steps inner loop,
and the full artifact round trip in one go.
"""
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gnnep_tpu.data.store import save_sample, write_index, GraphStore  # noqa: E402
from synthetic import make_samples  # noqa: E402


def run(cmd, **kw):
    print("::", " ".join(cmd))
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, **kw)
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        raise SystemExit(f"FAILED ({dt:.0f}s): {' '.join(cmd)}")
    print(f"   ok ({dt:.0f}s)")
    return r.stdout


def main():
    root = Path(tempfile.mkdtemp(prefix="gnnep_tpu_e2e_"))
    data = root / "data"
    art = root / "ensemble"
    samples = make_samples(48, seed=5, with_mat2vec_dim=200)
    for s in samples:
        save_sample(data, s)
    write_index(data, GraphStore.from_samples(samples))
    py = [sys.executable, "-m"]

    out = run(py + ["gnnep_tpu.cli.train",
                    "--data-dir", str(data), "--save-dir", str(art),
                    "--ensemble-size", "2", "--epochs", "3",
                    "--hidden", "256", "--layers", "2", "--heads", "4",
                    "--batch-size", "16",
                    "--conv-impl", "fused", "--compute-dtype", "bfloat16",
                    "--scan-steps", "4", "--test-frac", "0.1",
                    "--no-bootstrap-train"])
    print(out[-1200:])

    out = run(py + ["gnnep_tpu.cli.predict",
                    "--ensemble-dir", str(art), "--data-dir", str(data),
                    "--mode", "random", "--num-samples", "4",
                    "--output-json", str(root / "pred.json")])
    print(out[-600:])
    pred = json.loads((root / "pred.json").read_text())
    print("predictions:", len(pred.get("predictions", pred)))

    out = run(py + ["gnnep_tpu.cli.evaluate",
                    "--ensemble-dir", str(art), "--data-dir", str(data),
                    "--output-dir", str(root / "eval"),
                    "--eval-split", "val", "--no-plots"])
    print(out[-800:])
    print("artifacts at", root)


if __name__ == "__main__":
    main()

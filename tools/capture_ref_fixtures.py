#!/usr/bin/env python
"""Capture the reference binary's outputs on the shared synthetic parity
dataset as a committed fixture (tests/fixtures/ref_parity.npz), so
tests/test_reference_parity.py can assert on a clean checkout without a
compiled reference binary (VERDICT r3 #5: the reference's own protocol,
src/run_test.py:20-49, should gate every environment, not just the
machine that built the binary).

Run after tools/build_reference.sh:
    python tools/capture_ref_fixtures.py
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    import numpy as np

    import ref_parity

    if not os.path.exists(ref_parity.REF_BINARY):
        raise SystemExit("build the reference first: sh tools/build_reference.sh")

    from PIL import Image

    with tempfile.TemporaryDirectory() as tmp:
        paths, views, truth = ref_parity.render_dataset(tmp, 5, 320, 240)
        ref_counts, ref_size, ref_jpg_path = ref_parity.run_reference(paths, tmp)
        jpg = np.asarray(Image.open(ref_jpg_path).convert("RGB"), np.uint8)

    out = os.path.join(REPO, "tests", "fixtures", "ref_parity.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        counts=np.asarray(ref_counts, np.int32),
        size=np.asarray(ref_size, np.int32),
        jpg=jpg,
    )
    print(f"wrote {out}: counts={ref_counts} size={ref_size} "
          f"jpg={jpg.shape} ({os.path.getsize(out)/1e3:.0f} kB)")


if __name__ == "__main__":
    main()

"""Cross-validation against the compiled reference binary.

The reference's own integration protocol (src/run_test.py:20-49) greps the
binary's "Final Image Size" line and bounds the ratio vs a golden.  Here the
golden IS the reference binary itself, run on a shared synthetic dataset
(build it once with tools/build_reference.sh; the test skips if absent).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import ref_parity  # noqa: E402


pytestmark = pytest.mark.skipif(
    not os.path.exists(ref_parity.REF_BINARY),
    reason="reference binary not built (run tools/build_reference.sh)",
)


def test_reference_parity(tmp_path):
    """Final size within ratio 0.8 per dimension (run_test.py rule),
    per-image keypoint counts within 2x, camera reprojection error < 5 px
    vs synthetic ground truth."""
    paths, views, truth = ref_parity.render_dataset(str(tmp_path), 5, 320, 240)
    ref_counts, ref_size, ref_jpg = ref_parity.run_reference(
        paths, str(tmp_path)
    )
    # capacity caps well above the ~600 kpts/img this dataset yields —
    # smaller compiled shapes, same results, much faster on the CPU backend
    our_counts, our_size, reproj, our_canvas = ref_parity.run_ours(
        views, truth,
        MAX_CAND_PER_OCTAVE=1024, MAX_KP_PER_OCTAVE=512,
        MAX_DESC_PER_OCTAVE=512, MAX_KP_PER_IMAGE=1024,
        MAX_MATCHES_PER_PAIR=512,
    )

    def ratio(a, b):
        return min(a, b) / max(a, b)

    assert ratio(ref_size[0], our_size[0]) > 0.8, (ref_size, our_size)
    assert ratio(ref_size[1], our_size[1]) > 0.8, (ref_size, our_size)
    for rc, oc in zip(ref_counts, our_counts):
        assert ratio(rc, oc) > 0.5, (ref_counts, our_counts)
    assert reproj < 5.0
    # content-level parity: the two panoramas must actually look alike
    ncc = ref_parity.image_correlation(ref_jpg, our_canvas)
    assert ncc > 0.5, ncc

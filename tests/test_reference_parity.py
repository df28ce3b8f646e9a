"""Direct numerical parity against reference modules executed in-place
(read-only import from /root/reference; skipped when unavailable)."""

import importlib.util
import os

import numpy as np
import pytest

REF_POS_EMBED = "/root/reference/ECAMP/Pre-training/util/pos_embed.py"


@pytest.mark.skipif(not os.path.exists(REF_POS_EMBED),
                    reason="reference tree unavailable")
def test_sincos_pos_embed_matches_reference():
    spec = importlib.util.spec_from_file_location("ref_pos_embed",
                                                  REF_POS_EMBED)
    ref = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref)
    except Exception as e:  # old numpy aliases etc.
        if "np.float" in str(e) or "torch" in str(e):
            pytest.skip(f"reference module not importable here: {e}")
        raise

    from ecamp_tpu.nn.pos_embed import get_2d_sincos_pos_embed

    for dim, grid, cls in [(768, 14, True), (512, 14, True), (64, 4, False)]:
        try:
            expected = ref.get_2d_sincos_pos_embed(dim, grid, cls_token=cls)
        except AttributeError as e:
            # reference uses np.float (removed in numpy>=1.24); patch the
            # alias just for this call
            np.float = float  # type: ignore[attr-defined]
            try:
                expected = ref.get_2d_sincos_pos_embed(dim, grid,
                                                       cls_token=cls)
            finally:
                del np.float  # type: ignore[attr-defined]
        mine = get_2d_sincos_pos_embed(dim, grid, cls_token=cls)
        np.testing.assert_allclose(mine, expected.astype(np.float32),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"dim={dim} grid={grid}")

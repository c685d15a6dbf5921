"""DINO ViT featurizer tests (sensor/dino.py).

Numerics pinned against a minimal NumPy transformer oracle (same math as
the reference torch DINO, vision_transformer.py Attention/Mlp/Block), plus
interface/shape checks for the featurizer registry entry.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elevation_mapping_cupy_tpu.sensor.dino import (
    DinoFeaturizer,
    ViTConfig,
    dino_featurize,
    init_vit_params,
    vit_features,
)


def _np_layernorm(x, scale, bias, eps=1e-6):
    m = x.mean(-1, keepdims=True)
    v = x.var(-1, keepdims=True)
    return (x - m) / np.sqrt(v + eps) * scale + bias


def _np_vit_block(x, blk, num_heads):
    """Oracle for one transformer block in f64 (torch Block.forward)."""
    b, n, d = x.shape
    hd = d // num_heads
    y = _np_layernorm(x, blk["ln1_scale"], blk["ln1_bias"])
    qkv = y @ blk["qkv_w"] + blk["qkv_b"]
    qkv = qkv.reshape(b, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv
    attn = (q @ k.transpose(0, 1, 3, 2)) * hd ** -0.5
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, d)
    x = x + out @ blk["proj_w"] + blk["proj_b"]
    y = _np_layernorm(x, blk["ln2_scale"], blk["ln2_bias"])
    h = y @ blk["fc1_w"] + blk["fc1_b"]
    from scipy.stats import norm

    h = h * norm.cdf(h)  # exact gelu
    return x + h @ blk["fc2_w"] + blk["fc2_b"]


@pytest.fixture(scope="module")
def tiny_cfg():
    return ViTConfig(variant="vit_tiny", patch_size=8, dim=12,
                     compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return init_vit_params(jax.random.PRNGKey(7), tiny_cfg)


def test_backbone_matches_numpy_oracle(tiny_cfg, tiny_params):
    cfg, params = tiny_cfg, tiny_params
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)

    tokens, attn, keys = vit_features(params, jnp.asarray(img), cfg)

    # numpy oracle
    p = cfg.patch_size
    gh = gw = 32 // p
    np_params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    x = img.astype(np.float64).reshape(1, 3, gh, p, gw, p).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(1, gh * gw, 3 * p * p) @ np_params["patch_w"] + np_params["patch_b"]
    cls = np.broadcast_to(np_params["cls_token"], (1, 1, x.shape[-1]))
    x = np.concatenate([cls, x], 1)
    # 32/8 = 4x4 grid; stored pos_embed grid for p=8 is 28x28 -> resized;
    # easier: reuse the jax interpolation (it is jax.image.resize).
    from elevation_mapping_cupy_tpu.sensor.dino import _interp_pos_embed

    x = x + np.asarray(
        _interp_pos_embed(jnp.asarray(np_params["pos_embed"]), gh, gw),
        np.float64,
    )
    for blk in np_params["blocks"]:
        x = _np_vit_block(x, blk, cfg.num_heads)
    x = _np_layernorm(x, np_params["norm_scale"], np_params["norm_bias"])

    assert tokens.shape == (1, 1 + gh * gw, cfg.embed_dim)
    np.testing.assert_allclose(np.asarray(tokens), x, atol=2e-3, rtol=2e-3)
    assert attn.shape == (1, cfg.num_heads, 17, 17)
    # softmax rows sum to 1
    np.testing.assert_allclose(
        np.asarray(jnp.sum(attn, -1)), np.ones((1, cfg.num_heads, 17, 17)[:-1]), atol=1e-5
    )


def test_featurize_shapes_and_determinism(tiny_cfg, tiny_params):
    cfg, params = tiny_cfg, tiny_params
    img = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 3, 24, 40)).astype(np.float32)
    )
    feat, code = dino_featurize(params, img, cfg)
    assert feat.shape == (2, cfg.n_feats, 3, 5)
    assert code.shape == (2, cfg.dim, 3, 5)
    feat2, code2 = dino_featurize(params, img, cfg)
    np.testing.assert_array_equal(np.asarray(code), np.asarray(code2))


def test_kk_feat_type(tiny_params):
    cfg = ViTConfig(variant="vit_tiny", patch_size=8, dim=12,
                    feat_type="KK", compute_dtype=jnp.float32)
    img = jnp.zeros((1, 3, 16, 16))
    feat, code = dino_featurize(tiny_params, img, cfg)
    assert feat.shape == (1, cfg.embed_dim, 2, 2)
    assert code.shape == (1, 12, 2, 2)


def test_featurizer_predict_interface():
    f = DinoFeaturizer(
        channels=["f0", "f1"],
        cfg=ViTConfig(variant="vit_tiny", patch_size=8, dim=4,
                      compute_dtype=jnp.float32),
    )
    img = np.random.default_rng(2).integers(0, 255, (3, 33, 47), np.uint8)
    out = f.predict(img)
    assert set(out) == {"f0", "f1"}
    for v in out.values():
        assert v.shape == (33, 47) and np.isfinite(v).all()


def test_registry_resolves_dino():
    from elevation_mapping_cupy_tpu.sensor.networks import resolve_model

    m = resolve_model("dino_vits16", channels=["a"])
    assert hasattr(m, "predict")


def test_registry_detectron_gated_fallback(monkeypatch):
    """Without detectron2 installed the panoptic entry must degrade to the
    deterministic fallback (same channels) instead of raising. The absence
    is pinned by masking the package so the test never downloads model-zoo
    weights on machines that do have detectron2."""
    import sys
    import warnings

    from elevation_mapping_cupy_tpu.sensor.networks import MODELS, resolve_model

    monkeypatch.setitem(sys.modules, "detectron2", None)  # force ImportError
    assert "detectron_coco_panoptic_fpn_R_101_3x" in MODELS
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m = resolve_model(
            "detectron_coco_panoptic_fpn_R_101_3x", channels=["person", "grass"]
        )
    out = m.predict(np.zeros((3, 16, 16), np.uint8))
    assert set(out) == {"person", "grass"}

"""DINO ViT feature extractor — TPU-native JAX re-implementation.

Re-derivation of the reference's vendored torch DINO stack
(semantic_sensor/DINO/vision_transformer.py + modules.py:6-126): a frozen
ViT backbone whose last-block tokens (or per-head keys, "KK") feed a
STEGO-style linear / nonlinear projection head producing dense per-pixel
feature maps for the MEM semantic layers.

TPU-first design choices (vs the torch reference):
  * pure-functional parameter pytrees; one jitted ``featurize`` for the
    whole backbone+head (no module graph, no dropout at inference)
  * bf16 matmuls with f32 accumulation — the backbone is MXU-dominated
    (qkv/proj/mlp GEMMs over all patch tokens at once)
  * patch embedding as a reshape+matmul (a stride-p conv with kernel p is
    exactly a (p*p*3, D) GEMM over non-overlapping patches) — keeps the
    whole network on the MXU with zero conv lowering
  * bilinear pos-embed interpolation done once per (H, W) at trace time

Weights: ``load_torch_checkpoint`` imports the public DINO .pth files when
present on disk (facebook/dino naming); otherwise ``init_vit_params`` gives
deterministic random weights so the pipeline stays runnable end-to-end
(mirrors the reference CI, which skips model downloads).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "VIT_VARIANTS",
    "ViTConfig",
    "init_vit_params",
    "load_torch_checkpoint",
    "vit_features",
    "dino_featurize",
    "DinoFeaturizer",
]

VIT_VARIANTS = {
    # name: (embed_dim, depth, num_heads)
    "vit_tiny": (192, 12, 3),
    "vit_small": (384, 12, 6),
    "vit_base": (768, 12, 12),
}


class ViTConfig(NamedTuple):
    variant: str = "vit_small"
    patch_size: int = 8
    mlp_ratio: float = 4.0
    feat_type: str = "feat"           # "feat" | "KK"  (modules.py:103-109)
    projection_type: Optional[str] = "nonlinear"  # None | "linear" | "nonlinear"
    dim: int = 70                      # projection head output channels
    compute_dtype: Any = jnp.bfloat16

    @property
    def embed_dim(self) -> int:
        return VIT_VARIANTS[self.variant][0]

    @property
    def depth(self) -> int:
        return VIT_VARIANTS[self.variant][1]

    @property
    def num_heads(self) -> int:
        return VIT_VARIANTS[self.variant][2]

    @property
    def n_feats(self) -> int:
        """Channel count of the dense feature map (modules.py:35-38,106-109)."""
        if self.feat_type == "KK":
            return self.embed_dim  # heads * head_dim
        return self.embed_dim


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def init_vit_params(key: jax.Array, cfg: ViTConfig) -> Dict[str, Any]:
    """Deterministic random init mirroring the torch module tree."""
    d, depth, _ = VIT_VARIANTS[cfg.variant]
    p = cfg.patch_size
    hidden = int(d * cfg.mlp_ratio)
    keys = jax.random.split(key, depth * 6 + 6)
    ki = iter(range(len(keys)))

    def nk():
        return keys[next(ki)]

    params: Dict[str, Any] = {
        "patch_w": _trunc_normal(nk(), (p * p * 3, d)),
        "patch_b": jnp.zeros((d,)),
        "cls_token": _trunc_normal(nk(), (1, 1, d)),
        "pos_embed": _trunc_normal(nk(), (1, 197 if p == 16 else 785, d)),
        "norm_scale": jnp.ones((d,)),
        "norm_bias": jnp.zeros((d,)),
        "blocks": [],
    }
    for _ in range(depth):
        params["blocks"].append(
            {
                "ln1_scale": jnp.ones((d,)),
                "ln1_bias": jnp.zeros((d,)),
                "qkv_w": _trunc_normal(nk(), (d, 3 * d)),
                "qkv_b": jnp.zeros((3 * d,)),
                "proj_w": _trunc_normal(nk(), (d, d)),
                "proj_b": jnp.zeros((d,)),
                "ln2_scale": jnp.ones((d,)),
                "ln2_bias": jnp.zeros((d,)),
                "fc1_w": _trunc_normal(nk(), (d, hidden)),
                "fc1_b": jnp.zeros((hidden,)),
                "fc2_w": _trunc_normal(nk(), (hidden, d)),
                "fc2_b": jnp.zeros((d,)),
            }
        )
    # projection head (modules.py:44-72)
    nf = cfg.n_feats
    params["cluster1_w"] = _trunc_normal(nk(), (nf, cfg.dim))
    params["cluster1_b"] = jnp.zeros((cfg.dim,))
    if cfg.projection_type == "nonlinear":
        params["cluster2a_w"] = _trunc_normal(nk(), (nf, nf))
        params["cluster2a_b"] = jnp.zeros((nf,))
        params["cluster2b_w"] = _trunc_normal(nk(), (nf, cfg.dim))
        params["cluster2b_b"] = jnp.zeros((cfg.dim,))
    return params


def load_torch_checkpoint(path: str, cfg: ViTConfig, head_key: Optional[jax.Array] = None) -> Dict[str, Any]:
    """Import a public DINO ``.pth`` state dict (facebook/dino naming) into
    the JAX parameter tree. The projection head (not part of the DINO
    release) is randomly initialized."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]

    def t(name):
        return jnp.asarray(sd[name].numpy())

    d = cfg.embed_dim
    p = cfg.patch_size
    params = init_vit_params(
        head_key if head_key is not None else jax.random.PRNGKey(0), cfg
    )
    # conv (D, 3, p, p) -> (p*p*3, D) matmul over flattened patches laid out
    # (3, p, p) to match our patchify below
    conv = sd["patch_embed.proj.weight"].numpy()  # (D, 3, p, p)
    params["patch_w"] = jnp.asarray(conv.reshape(d, 3 * p * p).T)
    params["patch_b"] = t("patch_embed.proj.bias")
    params["cls_token"] = t("cls_token")
    params["pos_embed"] = t("pos_embed")
    params["norm_scale"] = t("norm.weight")
    params["norm_bias"] = t("norm.bias")
    for i, blk in enumerate(params["blocks"]):
        pre = f"blocks.{i}."
        blk["ln1_scale"] = t(pre + "norm1.weight")
        blk["ln1_bias"] = t(pre + "norm1.bias")
        blk["qkv_w"] = t(pre + "attn.qkv.weight").T
        blk["qkv_b"] = t(pre + "attn.qkv.bias")
        blk["proj_w"] = t(pre + "attn.proj.weight").T
        blk["proj_b"] = t(pre + "attn.proj.bias")
        blk["ln2_scale"] = t(pre + "norm2.weight")
        blk["ln2_bias"] = t(pre + "norm2.bias")
        blk["fc1_w"] = t(pre + "mlp.fc1.weight").T
        blk["fc1_b"] = t(pre + "mlp.fc1.bias")
        blk["fc2_w"] = t(pre + "mlp.fc2.weight").T
        blk["fc2_b"] = t(pre + "mlp.fc2.bias")
    return params


def _layernorm(x, scale, bias, eps=1e-6):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _interp_pos_embed(pos: jax.Array, gh: int, gw: int) -> jax.Array:
    """Bilinear pos-embed resize (vision_transformer.py interpolate_pos_encoding)."""
    n = pos.shape[1] - 1
    g0 = int(round(math.sqrt(n)))
    if g0 * g0 == n and (gh, gw) == (g0, g0):
        return pos
    cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
    d = pos.shape[-1]
    grid = grid_pos.reshape(1, g0, g0, d)
    resized = jax.image.resize(grid, (1, gh, gw, d), method="bilinear")
    return jnp.concatenate([cls_pos, resized.reshape(1, gh * gw, d)], axis=1)


def _attention(x, blk, num_heads, dtype):
    b, n, d = x.shape
    hd = d // num_heads
    qkv = (
        jnp.dot(x.astype(dtype), blk["qkv_w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + blk["qkv_b"]
    )
    qkv = qkv.reshape(b, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, hd)
    scale = hd ** -0.5
    attn = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(dtype), k.astype(dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", attn.astype(dtype), v.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    out = (
        jnp.dot(out.astype(dtype), blk["proj_w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + blk["proj_b"]
    )
    return out, attn, k


def _mlp(x, blk, dtype):
    h = (
        jnp.dot(x.astype(dtype), blk["fc1_w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + blk["fc1_b"]
    )
    h = jax.nn.gelu(h, approximate=False)
    return (
        jnp.dot(h.astype(dtype), blk["fc2_w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + blk["fc2_b"]
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def vit_features(
    params: Dict[str, Any], img: jax.Array, cfg: ViTConfig
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the backbone; returns (tokens (B, 1+N, D) post-norm, last-block
    attention (B, H, 1+N, 1+N), last-block keys (B, H, 1+N, hd)) — the
    ``get_intermediate_feat(n=1)`` surface the featurizer consumes."""
    b, c, h, w = img.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    dtype = cfg.compute_dtype

    # patchify: (B, 3, H, W) -> (B, gh*gw, 3*p*p) with (3, p, p) patch layout
    x = img.reshape(b, c, gh, p, gw, p).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, gh * gw, c * p * p)
    x = (
        jnp.dot(x.astype(dtype), params["patch_w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + params["patch_b"]
    )

    cls = jnp.broadcast_to(params["cls_token"], (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos_embed(params["pos_embed"], gh, gw)

    attn = keys = None
    for blk in params["blocks"]:
        y = _layernorm(x, blk["ln1_scale"], blk["ln1_bias"])
        a_out, attn, keys = _attention(y, blk, cfg.num_heads, dtype)
        x = x + a_out
        y = _layernorm(x, blk["ln2_scale"], blk["ln2_bias"])
        x = x + _mlp(y, blk, dtype)

    x = _layernorm(x, params["norm_scale"], params["norm_bias"])
    return x, attn, keys


@functools.partial(jax.jit, static_argnames=("cfg",))
def dino_featurize(
    params: Dict[str, Any], img: jax.Array, cfg: ViTConfig
) -> Tuple[jax.Array, jax.Array]:
    """DinoFeaturizer.forward equivalent (modules.py:74-126, inference path):
    returns (image_feat (B, n_feats, gh, gw), code (B, dim, gh, gw))."""
    b, _, h, w = img.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    tokens, _, keys = vit_features(params, img, cfg)

    if cfg.feat_type == "feat":
        feat = tokens[:, 1:, :]                      # (B, N, D)
    elif cfg.feat_type == "KK":
        # per-head keys of the patch tokens, heads*hd re-flattened
        k = keys[:, :, 1:, :]                         # (B, H, N, hd)
        feat = k.transpose(0, 2, 1, 3).reshape(b, gh * gw, -1)
    else:
        raise ValueError(f"unknown feat_type {cfg.feat_type}")

    image_feat = feat.reshape(b, gh, gw, -1).transpose(0, 3, 1, 2)

    if cfg.projection_type is None:
        return image_feat, image_feat
    dtype = cfg.compute_dtype
    code = (
        jnp.dot(feat.astype(dtype), params["cluster1_w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + params["cluster1_b"]
    )
    if cfg.projection_type == "nonlinear":
        h2 = jax.nn.relu(
            jnp.dot(feat.astype(dtype), params["cluster2a_w"].astype(dtype),
                    preferred_element_type=jnp.float32)
            + params["cluster2a_b"]
        )
        code = code + (
            jnp.dot(h2.astype(dtype), params["cluster2b_w"].astype(dtype),
                    preferred_element_type=jnp.float32)
            + params["cluster2b_b"]
        )
    code = code.reshape(b, gh, gw, -1).transpose(0, 3, 1, 2)
    return image_feat, code


class DinoFeaturizer:
    """Stateful wrapper with the sensor-registry ``predict`` interface.

    predict(image (3, H, W) uint8) -> {channel: (H, W) float32} — features
    are bilinearly upsampled back to pixel resolution like the reference
    pointcloud node does before back-projection.
    """

    IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(
        self,
        channels=None,
        cfg: ViTConfig = None,
        weight_file: Optional[str] = None,
        seed: int = 0,
    ):
        self.cfg = cfg or ViTConfig()
        if weight_file:
            self.params = load_torch_checkpoint(
                weight_file, self.cfg, jax.random.PRNGKey(seed)
            )
        else:
            self.params = init_vit_params(jax.random.PRNGKey(seed), self.cfg)
        n_out = self.cfg.dim if self.cfg.projection_type else self.cfg.n_feats
        self.channels = list(channels) if channels else [
            f"feat_{i}" for i in range(min(n_out, 16))
        ]
        if len(self.channels) > n_out:
            raise ValueError(
                f"{len(self.channels)} channels requested but the head emits "
                f"only {n_out} feature dims ({self.cfg.variant}, "
                f"projection_type={self.cfg.projection_type!r})"
            )

    def predict(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        img = np.asarray(image, np.float32) / 255.0
        img = (img - self.IMAGENET_MEAN[:, None, None]) / self.IMAGENET_STD[:, None, None]
        c, h, w = img.shape
        p = self.cfg.patch_size
        hp, wp = (h // p) * p, (w // p) * p
        img = img[:, :hp, :wp]
        _, code = dino_featurize(self.params, jnp.asarray(img[None]), self.cfg)
        code = jax.image.resize(code, (1, code.shape[1], h, w), method="bilinear")
        code = np.asarray(code[0])
        return {name: code[i] for i, name in enumerate(self.channels)}

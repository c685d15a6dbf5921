"""Semantic segmentation / feature extractor registry (networks.py equivalent).

Mirrors the reference sidecar's `resolve_model` registry
(semantic_sensor/networks.py:32-136): torchvision segmentation backbones and
a feature-extractor interface. Models are optional — environments without
torch (or without weights) get a deterministic fallback so the pipeline stays
runnable end-to-end.

All models expose:  predict(image (3, H, W) uint8) -> dict[channel, (H, W)]
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from .utils import encode_max

__all__ = ["resolve_model", "MODELS"]

VOC_CLASSES = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


class _TorchvisionSeg:
    def __init__(self, arch: str, channels: Sequence[str], pretrained: bool = True):
        import torch
        import torchvision

        self.torch = torch
        ctor = getattr(torchvision.models.segmentation, arch)
        self.model = ctor(weights="DEFAULT" if pretrained else None).eval()
        self.channels = list(channels)
        self.class_ids = [VOC_CLASSES.index(c) if c in VOC_CLASSES else -1 for c in channels]

    def predict(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        import torch

        x = torch.from_numpy(np.ascontiguousarray(image)).float() / 255.0
        mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
        x = ((x - mean) / std)[None]
        with torch.no_grad():
            out = self.model(x)["out"][0].softmax(0).numpy()
        result = {}
        for name, cid in zip(self.channels, self.class_ids):
            if cid >= 0:
                result[name] = out[cid]
        # class_max packed channel
        best = out.argmax(0).astype(np.uint32)
        prob = out.max(0)
        result["max_class"] = encode_max(prob, best)
        return result


class _RandomFeatures:
    """Deterministic fallback feature extractor (DINO-style interface) for
    environments without torch weights; hash-based per-pixel features."""

    def __init__(self, channels: Sequence[str], seed: int = 0):
        self.channels = list(channels) or ["feat_0"]
        self.seed = seed

    def predict(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        img = image.astype(np.float32) / 255.0
        gray = img.mean(0)
        gx = np.gradient(gray, axis=1)
        gy = np.gradient(gray, axis=0)
        dc = gray - gray.mean()
        return {
            name: np.tanh((k + 1) * gx + k * gy + dc)
            for k, name in enumerate(self.channels)
        }


class _Detectron2Panoptic:
    """COCO panoptic FPN (reference networks.py:66-243 DetectronModel).

    Stuff channels come from the semantic head's softmax; thing channels are
    instance masks scaled by detection score (networks.py:223-242). Requires
    detectron2 — environments without it fall back via resolve_model.
    """

    def __init__(self, channels: Sequence[str], weights: str = "COCO-PanopticSegmentation/panoptic_fpn_R_101_3x.yaml"):
        import torch  # noqa: F401  (detectron2 needs it)
        from detectron2 import model_zoo
        from detectron2.config import get_cfg
        from detectron2.data import MetadataCatalog
        from detectron2.engine import DefaultPredictor

        cfg = get_cfg()
        cfg.merge_from_file(model_zoo.get_config_file(weights))
        cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.5
        cfg.MODEL.WEIGHTS = model_zoo.get_checkpoint_url(weights)
        # reference DetectronModel runs on CUDA when present; fall back to CPU
        cfg.MODEL.DEVICE = "cuda" if torch.cuda.is_available() else "cpu"
        self.predictor = DefaultPredictor(cfg)
        meta = MetadataCatalog.get(cfg.DATASETS.TRAIN[0])
        stuff = {c: i for i, c in enumerate(meta.get("stuff_classes"))}
        thing = {c: i for i, c in enumerate(meta.get("thing_classes"))}
        # channel → (kind, class index); unknown channels are dropped, like
        # the reference's segmentation_channels resolution (networks.py:192-200)
        self.resolved = {}
        for c in channels:
            if c in stuff:
                self.resolved[c] = ("stuff", stuff[c])
            elif c in thing:
                self.resolved[c] = ("thing", thing[c])
        self.channels = list(self.resolved)

    def predict(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        import torch

        bgr = np.ascontiguousarray(image[::-1].transpose(1, 2, 0))  # reference flips RGB→BGR
        pred = self.predictor(bgr)
        sem = torch.softmax(pred["sem_seg"], dim=0).cpu().numpy()
        seg_ids, instances = pred["panoptic_seg"]
        seg_ids = seg_ids.cpu().numpy()
        out: Dict[str, np.ndarray] = {}
        for name, (kind, cid) in self.resolved.items():
            if kind == "stuff":
                out[name] = sem[cid]
            else:
                acc = np.zeros(seg_ids.shape, np.float32)
                for inst in instances or []:
                    if inst and inst.get("isthing") and inst.get("category_id") == cid:
                        acc = np.maximum(acc, (seg_ids == inst["id"]) * float(inst.get("score", 1.0)))
                out[name] = acc
        return out


def _dino(variant: str, patch: int):
    def ctor(channels=None, weight_file=None, **kw):
        from .dino import DinoFeaturizer, ViTConfig

        return DinoFeaturizer(
            channels=channels,
            cfg=ViTConfig(variant=variant, patch_size=patch),
            weight_file=weight_file,
            **kw,
        )

    return ctor


MODELS: Dict[str, Callable[..., object]] = {
    "fcn_resnet50": lambda channels=VOC_CLASSES[1:], **kw: _TorchvisionSeg("fcn_resnet50", channels, **kw),
    "lraspp_mobilenet_v3_large": lambda channels=VOC_CLASSES[1:], **kw: _TorchvisionSeg("lraspp_mobilenet_v3_large", channels, **kw),
    "deeplabv3_resnet50": lambda channels=VOC_CLASSES[1:], **kw: _TorchvisionSeg("deeplabv3_resnet50", channels, **kw),
    # JAX DINO ViT featurizers (sensor/dino.py); pass weight_file= to load
    # the public facebook/dino .pth checkpoints
    "dino_vits8": _dino("vit_small", 8),
    "dino_vits16": _dino("vit_small", 16),
    "dino_vitb8": _dino("vit_base", 8),
    "dino_vitb16": _dino("vit_base", 16),
    "detectron_coco_panoptic_fpn_R_101_3x": lambda channels=("person", "grass"), **kw: _Detectron2Panoptic(channels, **kw),
    "random_features": lambda channels=("feat_0",), **kw: _RandomFeatures(channels),
}


def resolve_model(name: str, channels: Optional[Sequence[str]] = None, **kw):
    """Instantiate a registered model; falls back to random features if the
    torch stack is unavailable."""
    import warnings

    ctor = MODELS.get(name)
    if ctor is None:
        raise ValueError(f"unknown model {name!r}; have {sorted(MODELS)}")
    try:
        return ctor(channels=channels, **kw) if channels else ctor(**kw)
    except (ImportError, ModuleNotFoundError, OSError, RuntimeError) as e:
        # environment problems (no torch stack, download/weight-load failure)
        # degrade to the deterministic fallback; programming errors
        # (TypeError from a typo'd kwarg, ValueError) propagate
        warnings.warn(
            f"[sensor.networks] {name} unavailable ({e!r}); using random_features"
        )
        return _RandomFeatures(channels or ("feat_0",))

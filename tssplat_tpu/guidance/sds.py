"""Score-distillation (SDS) guidance for image-to-3D TetSphere optimization.

Extended scope per SURVEY §7.8: the reference repo ships only the
multi-view reconstruction driver (its img_to_3D config consumes
Wonder3D-generated views offline); the SDS loop itself lives in the
paper's threestudio context. Here it is a first-class driver
(train_sds.py) with a pluggable guidance interface.

TPU-native structure: a diffusion model cannot run inside jit (and the
axon TPU plugin rejects host callbacks at compile time — see
ops/rasterize.overflow_checks_enabled), so the step splits in three:

  1. jitted render: params -> images, with the vjp closed over the traced
     render (the expensive rasterize/AA/energy backward stays on TPU);
  2. host guidance: eps-prediction on the rendered images — any numpy
     function: a diffusers UNet (torch CPU/GPU), or the analytic
     target-image score used in tests;
  3. jitted update: the SDS image-space gradient pulls back through the
     saved vjp, adds the energy gradient, and steps the optimizer.

The SDS gradient is the standard DreamFusion estimator
(arXiv:2209.14988 eq. 2): grad_x = w(t) * (eps_hat(x_t, t) - eps) with
x_t = sqrt(ab_t) x0 + sqrt(1-ab_t) eps — no backprop through the
diffusion model.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np


@dataclass
class SDSConfig:
    t_min: float = 0.02            # timestep sampling range (fraction)
    t_max: float = 0.98
    guidance_scale: float = 7.5    # classifier-free guidance (diffusers)
    n_train_timesteps: int = 1000
    beta_start: float = 0.00085    # StableDiffusion's scaled_linear betas
    beta_end: float = 0.012
    seed: int = 0


def _alphas_cumprod(cfg: SDSConfig) -> np.ndarray:
    betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                        cfg.n_train_timesteps) ** 2
    return np.cumprod(1.0 - betas)


def sds_image_grad(x0: np.ndarray, guidance, cfg: SDSConfig,
                   rng: np.random.Generator,
                   cond=None) -> np.ndarray:
    """One SDS sample: the image-space gradient w(t)(eps_hat - eps).

    x0: (B,H,W,C) in [-1, 1]. guidance: callable(x_t, t_idx, eps, cond)
    -> eps_hat, all numpy, never differentiated. Returns grad, same shape
    as x0, normalized by batch size (the caller pulls it back through the
    render vjp)."""
    ab = _alphas_cumprod(cfg)
    t_idx = int(rng.integers(int(cfg.t_min * cfg.n_train_timesteps),
                             int(cfg.t_max * cfg.n_train_timesteps)))
    a = ab[t_idx]
    eps = rng.standard_normal(x0.shape).astype(np.float32)
    x_t = math.sqrt(a) * x0 + math.sqrt(1.0 - a) * eps
    eps_hat = guidance(x_t, t_idx, eps, cond)
    w = 1.0 - a
    return (w * (eps_hat - eps) / max(x0.shape[0], 1)).astype(np.float32)


class TargetImageGuidance:
    """Analytic 'diffusion' whose score points at a fixed target image:
    eps_hat(x_t, t) = (x_t - sqrt(ab_t) * target) / sqrt(1 - ab_t), i.e.
    the exact eps-prediction of the degenerate data distribution
    delta(target). SDS under it reduces in expectation to w(t)*sqrt(ab_t)
    * (x0 - target) — gradient descent toward the target — so the whole
    driver (render -> vjp -> guidance -> update) is testable end-to-end
    with no model weights (tests/test_sds.py)."""

    def __init__(self, target: np.ndarray, cfg: SDSConfig):
        # (B,H,W,C) in [-1,1]; or a (n_cameras,H,W,C) bank indexed by the
        # driver's sampled view ids (cond)
        self.target = np.asarray(target, np.float32)
        self.ab = _alphas_cumprod(cfg)

    def __call__(self, x_t, t_idx, eps, cond=None):
        tgt = self.target[np.asarray(cond)] if cond is not None \
            else self.target
        a = self.ab[t_idx]
        return ((x_t - math.sqrt(a) * tgt)
                / math.sqrt(1.0 - a)).astype(np.float32)


class DiffusersGuidance:
    """HuggingFace diffusers eps-prediction with classifier-free guidance
    (torch; weights must be available locally — this environment has no
    network egress, so construction raises a clear error when they are
    not). Latent-space models first encode x0 through the VAE; for
    simplicity and determinism this adapter targets PIXEL-space
    eps-prediction UNets (e.g. DeepFloyd-IF stage 1 or any
    prediction_type='epsilon' pixel model)."""

    def __init__(self, model_id: str, prompt: str, cfg: SDSConfig,
                 negative_prompt: str = "", device: str = "cpu"):
        import torch
        from diffusers import UNet2DConditionModel, DDPMScheduler
        from transformers import AutoTokenizer, CLIPTextModel

        unet = UNet2DConditionModel.from_pretrained(
            model_id, subfolder="unet").to(device).eval()
        sched = DDPMScheduler.from_pretrained(model_id,
                                              subfolder="scheduler")
        tok = AutoTokenizer.from_pretrained(model_id, subfolder="tokenizer")
        txt = CLIPTextModel.from_pretrained(
            model_id, subfolder="text_encoder").to(device).eval()
        with torch.no_grad():
            def emb(p):
                ids = tok(p, padding="max_length",
                          max_length=tok.model_max_length,
                          return_tensors="pt").input_ids.to(device)
                return txt(ids)[0]
            emb_cond = emb(prompt)
            emb_un = emb(negative_prompt)
        self._init_components(unet, sched, emb_cond, emb_un, cfg, device)

    @classmethod
    def from_components(cls, unet, scheduler, emb_cond, emb_un,
                        cfg: SDSConfig, device: str = "cpu"):
        """Construct from already-built components — no from_pretrained,
        no network. This is how the call path (classifier-free guidance
        combination + NHWC<->NCHW conversion + embedding broadcast) is
        exercised in tests/test_sds.py with a contract-mock UNet; only the
        weight-loading constructor above requires local model files."""
        self = cls.__new__(cls)
        self._init_components(unet, scheduler, emb_cond, emb_un, cfg,
                              device)
        return self

    def _init_components(self, unet, sched, emb_cond, emb_un, cfg, device):
        import torch
        self.torch = torch
        self.cfg = cfg
        self.device = device
        self.unet = unet
        self.sched = sched
        self.emb_cond = emb_cond
        self.emb_un = emb_un

    def __call__(self, x_t, t_idx, eps, cond=None):
        torch = self.torch
        x = torch.from_numpy(np.moveaxis(x_t, -1, 1)).to(self.device)
        t = torch.tensor([t_idx], device=self.device)
        with torch.no_grad():
            e_c = self.unet(x, t, encoder_hidden_states=self.emb_cond
                            .expand(x.shape[0], -1, -1)).sample
            e_u = self.unet(x, t, encoder_hidden_states=self.emb_un
                            .expand(x.shape[0], -1, -1)).sample
        e = e_u + self.cfg.guidance_scale * (e_c - e_u)
        return np.moveaxis(e.cpu().numpy(), 1, -1).astype(np.float32)


def load_guidance(gcfg: dict, cfg: SDSConfig,
                  target_loader: Optional[Callable] = None):
    """Config-driven guidance factory: type 'target_image' (analytic — the
    image-to-3D single-view case: distill the rendered views toward the
    conditioning image) or 'diffusers' (model weights)."""
    gtype = gcfg.get("type", "target_image")
    if gtype == "target_image":
        if target_loader is None:
            raise ValueError("target_image guidance needs a target image")
        return TargetImageGuidance(target_loader(), cfg)
    if gtype == "diffusers":
        return DiffusersGuidance(gcfg["model_id"], gcfg.get("prompt", ""),
                                 cfg,
                                 negative_prompt=gcfg.get("negative_prompt",
                                                          ""),
                                 device=gcfg.get("device", "cpu"))
    raise ValueError(f"unknown guidance type {gtype!r}")

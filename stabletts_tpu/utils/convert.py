"""PyTorch checkpoint -> flax params converter.

Maps the reference StableTTS / Vocos state-dict layouts (reference:
models/model.py:30-46, vocoders/vocos/models/model.py:11-20) onto this
framework's param trees. Works on plain numpy arrays so torch is only needed
by the caller that loads the .pt file.

Layout transforms:
  torch Linear [out, in]        -> dense kernel [in, out]          (transpose)
  torch Conv1d k=1 [out, in, 1] -> dense kernel [in, out]          (squeeze + T)
  torch Conv1d k>1 [out, in, k] -> conv kernel [k, in, out]        (permute)
  torch LayerNorm weight/bias   -> scale/bias
  torch Embedding [V, C]        -> embedding
  packed MHA in_proj [3C, C]    -> q/k/v dense kernels             (split + T)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _dense(w, b=None):
    out = {"kernel": np.ascontiguousarray(w.squeeze(-1).T if w.ndim == 3 else w.T)}
    if b is not None:
        out["bias"] = b
    return out


def _conv(w, b=None):
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))}
    if b is not None:
        out["bias"] = b
    return out


def _ln(w, b):
    return {"scale": w, "bias": b}


class _SD:
    """Helper: typed access into a flat numpy state dict with consumption tracking."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = dict(sd)
        self.used = set()

    def __call__(self, key):
        self.used.add(key)
        return self.sd[key]

    def has(self, key):
        return key in self.sd

    def dense(self, prefix):
        b = self(f"{prefix}.bias") if self.has(f"{prefix}.bias") else None
        return _dense(self(f"{prefix}.weight"), b)

    def conv(self, prefix):
        b = self(f"{prefix}.bias") if self.has(f"{prefix}.bias") else None
        return _conv(self(f"{prefix}.weight"), b)

    def ln(self, prefix):
        return _ln(self(f"{prefix}.weight"), self(f"{prefix}.bias"))

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _convert_dit_block(sd: _SD, p: str) -> dict:
    """One DiTConVBlock (reference: models/diffusion_transformer.py:84-122)."""
    out = {
        "attn": {
            "conv_q": sd.dense(f"{p}.attn.conv_q"),
            "conv_k": sd.dense(f"{p}.attn.conv_k"),
            "conv_v": sd.dense(f"{p}.attn.conv_v"),
            "conv_o": sd.dense(f"{p}.attn.conv_o"),
        },
        "mlp": {
            "conv_1": sd.conv(f"{p}.mlp.conv_1"),
            "conv_2": sd.conv(f"{p}.mlp.conv_2"),
        },
    }
    # adaLN: [Identity|Linear, SiLU, Linear]
    if sd.has(f"{p}.adaLN_modulation.0.weight"):
        out["adaLN_proj"] = sd.dense(f"{p}.adaLN_modulation.0")
    out["adaLN_modulation"] = sd.dense(f"{p}.adaLN_modulation.2")
    return out


def _convert_mel_style_encoder(sd: _SD, p: str) -> dict:
    """MelStyleEncoder incl. packed-MHA split (reference: reference_encoder.py:25-92)."""
    in_proj_w = sd(f"{p}.slf_attn.in_proj_weight")
    in_proj_b = sd(f"{p}.slf_attn.in_proj_bias")
    c = in_proj_w.shape[1]
    qw, kw, vw = in_proj_w[:c], in_proj_w[c : 2 * c], in_proj_w[2 * c :]
    qb, kb, vb = in_proj_b[:c], in_proj_b[c : 2 * c], in_proj_b[2 * c :]
    return {
        "spectral_0": sd.dense(f"{p}.spectral.0"),
        "spectral_3": sd.dense(f"{p}.spectral.3"),
        "temporal_0": {"conv1": sd.conv(f"{p}.temporal.0.conv1")},
        "temporal_1": {"conv1": sd.conv(f"{p}.temporal.1.conv1")},
        "slf_attn": {
            "q_proj": _dense(qw, qb),
            "k_proj": _dense(kw, kb),
            "v_proj": _dense(vw, vb),
            "out_proj": sd.dense(f"{p}.slf_attn.out_proj"),
        },
        "fc": sd.dense(f"{p}.fc"),
    }


def torch_to_flax_stabletts(state_dict: Dict[str, np.ndarray], n_enc_layers=3, n_dec_layers=6) -> dict:
    """Reference StableTTS state dict -> flax params for models.stabletts.StableTTS."""
    sd = _SD(state_dict)
    params: dict = {}

    params["fake_speaker"] = sd("fake_speaker")
    params["fake_content"] = sd("fake_content").squeeze(-1)  # [1, C, 1] -> [1, C]

    enc = {"emb": {"embedding": sd("encoder.emb.weight")}, "proj": sd.dense("encoder.proj")}
    for i in range(n_enc_layers):
        enc[f"encoder_{i}"] = _convert_dit_block(sd, f"encoder.encoder.{i}")
    params["encoder"] = enc

    params["ref_encoder"] = _convert_mel_style_encoder(sd, "ref_encoder")

    params["dp"] = {
        "cond": sd.dense("dp.cond"),
        "conv1": sd.conv("dp.conv1"),
        "norm1": sd.ln("dp.norm1"),
        "conv2": sd.conv("dp.conv2"),
        "norm2": sd.ln("dp.norm2"),
        "proj": sd.dense("dp.proj"),
    }

    est = {
        "time_mlp": {
            "layer_0": sd.dense("decoder.estimator.time_mlp.layer.0"),
            "layer_2": sd.dense("decoder.estimator.time_mlp.layer.2"),
        },
        "cond_proj_0": sd.conv("decoder.estimator.cond_proj.0"),
        "cond_proj_2": sd.conv("decoder.estimator.cond_proj.2"),
        "cond_proj_4": sd.conv("decoder.estimator.cond_proj.4"),
        "in_proj": sd.dense("decoder.estimator.in_proj"),
        "final_proj": sd.dense("decoder.estimator.final_proj"),
    }
    for i in range(n_dec_layers):
        est[f"blocks_{i}"] = {
            "time_fusion": {"film": sd.dense(f"decoder.estimator.blocks.{i}.time_fusion.film")},
            "block": _convert_dit_block(sd, f"decoder.estimator.blocks.{i}.block"),
        }
    for j in range(n_dec_layers // 2):
        est[f"lsc_{j}"] = sd.conv(f"decoder.estimator.lsc_layers.{j}")
    params["decoder"] = {"estimator": est}

    leftovers = [k for k in sd.unused() if "rotary" not in k and "num_batches" not in k]
    if leftovers:
        raise ValueError(f"unconverted reference params: {leftovers}")
    return params


def torch_to_flax_vocos(state_dict: Dict[str, np.ndarray], num_layers=8) -> dict:
    """Reference Vocos state dict -> flax params for models.vocos.Vocos."""
    sd = _SD(state_dict)
    backbone = {
        "embed": sd.conv("backbone.embed"),
        "norm": sd.ln("backbone.norm"),
        "final_layer_norm": sd.ln("backbone.final_layer_norm"),
    }
    for i in range(num_layers):
        p = f"backbone.convnext.{i}"
        backbone[f"convnext_{i}"] = {
            "dwconv": sd.conv(f"{p}.dwconv"),
            "norm": sd.ln(f"{p}.norm"),
            "pwconv1": sd.dense(f"{p}.pwconv1"),
            "pwconv2": sd.dense(f"{p}.pwconv2"),
            "gamma": sd(f"{p}.gamma"),
        }
    params = {"backbone": backbone, "head": {"out": sd.dense("head.out")}}
    leftovers = [k for k in sd.unused() if "window" not in k]
    if leftovers:
        raise ValueError(f"unconverted reference params: {leftovers}")
    return params


def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """w = g * v / ||v|| with the norm over all dims except 0 (torch
    weight_norm default dim=0). Used to fold inference-only weight-normed
    convs (FireflyGAN) into plain kernels."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return (g * v / norm).astype(np.float32)


class _WNSD(_SD):
    """State-dict accessor that transparently folds weight-normed convs."""

    def weight(self, prefix):
        if self.has(f"{prefix}.parametrizations.weight.original0"):
            g = self(f"{prefix}.parametrizations.weight.original0")
            v = self(f"{prefix}.parametrizations.weight.original1")
            return fold_weight_norm(g, v)
        # older torch serialization: weight_g / weight_v
        if self.has(f"{prefix}.weight_g"):
            return fold_weight_norm(self(f"{prefix}.weight_g"), self(f"{prefix}.weight_v"))
        return self(f"{prefix}.weight")

    def dense(self, prefix):
        b = self(f"{prefix}.bias") if self.has(f"{prefix}.bias") else None
        return _dense(self.weight(prefix), b)

    def conv(self, prefix):
        b = self(f"{prefix}.bias") if self.has(f"{prefix}.bias") else None
        return _conv(self.weight(prefix), b)

    def conv_transpose_kernel(self, prefix):
        """torch ConvTranspose1d weight [C_in, C_out, k] -> [k, C_in, C_out]."""
        return np.ascontiguousarray(np.transpose(self.weight(prefix), (2, 0, 1)))


def torch_to_flax_ffgan(state_dict: Dict[str, np.ndarray]) -> dict:
    """FireflyGANBase state dict -> flax params for models.ffgan.FireflyGANBase
    (reference: vocoders/ffgan/model.py:44-57). Weight norm is folded."""
    sd = _WNSD(state_dict)
    depths = (3, 3, 9, 3)

    backbone: dict = {
        "stem_conv": sd.conv("backbone.downsample_layers.0.0"),
        "stem_norm": _ln(
            sd("backbone.downsample_layers.0.1.weight"), sd("backbone.downsample_layers.0.1.bias")
        ),
        "norm": _ln(sd("backbone.norm.weight"), sd("backbone.norm.bias")),
    }
    for i in range(1, 4):
        backbone[f"mid_norm_{i}"] = _ln(
            sd(f"backbone.downsample_layers.{i}.0.weight"),
            sd(f"backbone.downsample_layers.{i}.0.bias"),
        )
        backbone[f"mid_conv_{i}"] = sd.dense(f"backbone.downsample_layers.{i}.1")
    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"backbone.stages.{i}.{j}"
            backbone[f"stages_{i}_{j}"] = {
                "dwconv": sd.conv(f"{p}.dwconv"),
                "norm": _ln(sd(f"{p}.norm.weight"), sd(f"{p}.norm.bias")),
                "pwconv1": sd.dense(f"{p}.pwconv1"),
                "pwconv2": sd.dense(f"{p}.pwconv2"),
                "gamma": sd(f"{p}.gamma"),
            }

    head: dict = {
        "conv_pre": sd.conv("head.conv_pre"),
        "conv_post": sd.conv("head.conv_post"),
    }
    for i in range(5):
        head[f"ups_{i}_kernel"] = sd.conv_transpose_kernel(f"head.ups.{i}")
        head[f"ups_{i}_bias"] = sd(f"head.ups.{i}.bias")
        rb: dict = {}
        for j in range(3):
            blk: dict = {}
            for m in range(3):
                w1 = sd.weight(f"head.resblocks.{i}.blocks.{j}.convs1.{m}")
                w2 = sd.weight(f"head.resblocks.{i}.blocks.{j}.convs2.{m}")
                blk[f"convs1_{m}_kernel"] = np.ascontiguousarray(np.transpose(w1, (2, 1, 0)))
                blk[f"convs1_{m}_bias"] = sd(f"head.resblocks.{i}.blocks.{j}.convs1.{m}.bias")
                blk[f"convs2_{m}_kernel"] = np.ascontiguousarray(np.transpose(w2, (2, 1, 0)))
                blk[f"convs2_{m}_bias"] = sd(f"head.resblocks.{i}.blocks.{j}.convs2.{m}.bias")
            rb[f"blocks_{j}"] = blk
        head[f"resblocks_{i}"] = rb

    params = {"backbone": backbone, "head": head}
    leftovers = [k for k in sd.unused() if "num_batches" not in k]
    if leftovers:
        raise ValueError(f"unconverted reference params: {leftovers}")
    return params


# ---------------------------------------------------------------------------
# Reverse export: flax params -> reference torch state-dict layout, so models
# trained on TPU can run in the reference PyTorch stack. Exact inverse of the
# import transforms above; tests/test_parity_stabletts.py round-trips
# torch -> flax -> torch and asserts bit equality on every exported tensor.


def _t_linear(out: Dict[str, np.ndarray], prefix: str, d: dict):
    """flax dense {kernel [in,out], bias?} -> torch Linear weight [out,in]."""
    out[f"{prefix}.weight"] = np.ascontiguousarray(d["kernel"].T)
    if "bias" in d:
        out[f"{prefix}.bias"] = d["bias"]


def _t_conv1x1(out: Dict[str, np.ndarray], prefix: str, d: dict):
    """flax dense -> torch Conv1d k=1 weight [out,in,1]."""
    out[f"{prefix}.weight"] = np.ascontiguousarray(d["kernel"].T)[..., None]
    if "bias" in d:
        out[f"{prefix}.bias"] = d["bias"]


def _t_conv(out: Dict[str, np.ndarray], prefix: str, d: dict):
    """flax conv {kernel [k,in,out]} -> torch Conv1d weight [out,in,k]."""
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.transpose(d["kernel"], (2, 1, 0)))
    if "bias" in d:
        out[f"{prefix}.bias"] = d["bias"]


def _t_ln(out: Dict[str, np.ndarray], prefix: str, d: dict):
    out[f"{prefix}.weight"] = d["scale"]
    out[f"{prefix}.bias"] = d["bias"]


def _export_dit_block(out: Dict[str, np.ndarray], p: str, blk: dict):
    for name in ("conv_q", "conv_k", "conv_v", "conv_o"):
        _t_conv1x1(out, f"{p}.attn.{name}", blk["attn"][name])
    _t_conv(out, f"{p}.mlp.conv_1", blk["mlp"]["conv_1"])
    _t_conv(out, f"{p}.mlp.conv_2", blk["mlp"]["conv_2"])
    if "adaLN_proj" in blk:
        _t_linear(out, f"{p}.adaLN_modulation.0", blk["adaLN_proj"])
    _t_linear(out, f"{p}.adaLN_modulation.2", blk["adaLN_modulation"])


def _export_mel_style_encoder(out: Dict[str, np.ndarray], p: str, enc: dict):
    _t_linear(out, f"{p}.spectral.0", enc["spectral_0"])
    _t_linear(out, f"{p}.spectral.3", enc["spectral_3"])
    _t_conv(out, f"{p}.temporal.0.conv1", enc["temporal_0"]["conv1"])
    _t_conv(out, f"{p}.temporal.1.conv1", enc["temporal_1"]["conv1"])
    attn = enc["slf_attn"]
    out[f"{p}.slf_attn.in_proj_weight"] = np.ascontiguousarray(
        np.concatenate([attn["q_proj"]["kernel"].T, attn["k_proj"]["kernel"].T,
                        attn["v_proj"]["kernel"].T], axis=0)
    )
    out[f"{p}.slf_attn.in_proj_bias"] = np.concatenate(
        [attn["q_proj"]["bias"], attn["k_proj"]["bias"], attn["v_proj"]["bias"]]
    )
    _t_linear(out, f"{p}.slf_attn.out_proj", attn["out_proj"])
    _t_linear(out, f"{p}.fc", enc["fc"])


def flax_to_torch_stabletts(params: dict, n_enc_layers=3, n_dec_layers=6) -> Dict[str, np.ndarray]:
    """flax StableTTS params -> reference torch state-dict layout (inverse of
    torch_to_flax_stabletts; reference module layer types per
    models/text_encoder.py:22-26, diffusion_transformer.py:43-95,
    duration_predictor.py:16-22, estimator.py:29,56-94). Buffers the torch
    modules recompute (rotary caches) are not emitted — load with
    strict=False or via the reference's own loading helpers."""
    out: Dict[str, np.ndarray] = {}
    out["fake_speaker"] = np.asarray(params["fake_speaker"])
    out["fake_content"] = np.asarray(params["fake_content"])[..., None]  # [1,C] -> [1,C,1]

    enc = params["encoder"]
    out["encoder.emb.weight"] = np.asarray(enc["emb"]["embedding"])
    _t_conv1x1(out, "encoder.proj", enc["proj"])
    for i in range(n_enc_layers):
        _export_dit_block(out, f"encoder.encoder.{i}", enc[f"encoder_{i}"])

    _export_mel_style_encoder(out, "ref_encoder", params["ref_encoder"])

    dp = params["dp"]
    _t_conv1x1(out, "dp.cond", dp["cond"])
    _t_conv(out, "dp.conv1", dp["conv1"])
    _t_ln(out, "dp.norm1", dp["norm1"])
    _t_conv(out, "dp.conv2", dp["conv2"])
    _t_ln(out, "dp.norm2", dp["norm2"])
    _t_conv1x1(out, "dp.proj", dp["proj"])

    est = params["decoder"]["estimator"]
    _t_linear(out, "decoder.estimator.time_mlp.layer.0", est["time_mlp"]["layer_0"])
    _t_linear(out, "decoder.estimator.time_mlp.layer.2", est["time_mlp"]["layer_2"])
    for j in (0, 2, 4):
        _t_conv(out, f"decoder.estimator.cond_proj.{j}", est[f"cond_proj_{j}"])
    _t_conv1x1(out, "decoder.estimator.in_proj", est["in_proj"])
    _t_conv1x1(out, "decoder.estimator.final_proj", est["final_proj"])
    for i in range(n_dec_layers):
        blk = est[f"blocks_{i}"]
        _t_conv1x1(out, f"decoder.estimator.blocks.{i}.time_fusion.film",
                   blk["time_fusion"]["film"])
        _export_dit_block(out, f"decoder.estimator.blocks.{i}.block", blk["block"])
    for j in range(n_dec_layers // 2):
        _t_conv(out, f"decoder.estimator.lsc_layers.{j}", est[f"lsc_{j}"])
    return {k: np.asarray(v, dtype=np.float32) for k, v in out.items()}


def flax_to_torch_vocos(params: dict, num_layers=8) -> Dict[str, np.ndarray]:
    """flax Vocos params -> reference torch state-dict layout (inverse of
    torch_to_flax_vocos; reference vocoders/vocos/models/model.py). The ISTFT
    window buffer is a constant hann window the reference re-registers, so it
    is not emitted."""
    out: Dict[str, np.ndarray] = {}
    bb = params["backbone"]
    _t_conv(out, "backbone.embed", bb["embed"])
    _t_ln(out, "backbone.norm", bb["norm"])
    _t_ln(out, "backbone.final_layer_norm", bb["final_layer_norm"])
    for i in range(num_layers):
        blk = bb[f"convnext_{i}"]
        p = f"backbone.convnext.{i}"
        _t_conv(out, f"{p}.dwconv", blk["dwconv"])
        _t_ln(out, f"{p}.norm", blk["norm"])
        _t_linear(out, f"{p}.pwconv1", blk["pwconv1"])
        _t_linear(out, f"{p}.pwconv2", blk["pwconv2"])
        out[f"{p}.gamma"] = np.asarray(blk["gamma"])
    _t_linear(out, "head.out", params["head"]["out"])
    return {k: np.asarray(v, dtype=np.float32) for k, v in out.items()}


def save_torch_checkpoint(state_dict: Dict[str, np.ndarray], path: str) -> None:
    """Write a numpy state dict as a torch .pt file loadable by the reference
    stack (torch.load(..., weights_only=True))."""
    import torch

    torch.save(
        {k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True)) for k, v in state_dict.items()},
        path,
    )


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Detach a torch state dict to float32 numpy (caller provides torch tensors)."""
    return {k: np.asarray(v.detach().cpu().numpy(), dtype=np.float32) for k, v in state_dict.items()}


def load_torch_state_dict_numpy(path: str) -> Dict[str, np.ndarray]:
    """torch .pt checkpoint -> float32 numpy state dict, unwrapping the
    common {'state_dict': ...} container (shared by api._load_params and the
    convert CLI so the loading conventions can't drift apart)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return torch_state_dict_to_numpy(sd)

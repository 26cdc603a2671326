"""Convert torch checkpoints (HF DINOv2 / reference Lightning ckpt) to flax params.

Two entry points:

- :func:`convert_hf_dinov2` — HuggingFace ``Dinov2Model`` state_dict ->
  ``Dinov2Encoder`` param tree. Used to import ``facebook/dinov2-small`` weights.
- :func:`convert_lightning_ckpt` — the reference's full Lightning checkpoint
  (``CrossScore-v1.0.0.ckpt``; state_dict keys rooted at ``model.``) -> the
  complete CrossScoreNet param tree. Covers backbone (HF names nested under
  ``model.backbone.``), multi-view PE (``model.pos_enc_fn.PE``), the 2-layer
  decoder (packed ``in_proj_weight`` split into q/k/v) and the MLP head.

Inputs are dicts of numpy arrays (call :func:`state_dict_to_numpy` on a torch
state_dict first) so this module has no hard torch dependency at import time.

Layout mapping notes:
- torch Linear weight (out, in) -> flax Dense kernel (in, out): transpose.
- patch-embed conv weight (D, 3, P, P) -> (P, P, 3, D) -> reshape (P*P*3, D),
  matching the (p_h, p_w, c) patch-pixel flattening in models/dinov2.py.
- fused qkv kernel = concat([Wq.T, Wk.T, Wv.T], axis=1); the (3, h, hd) output
  reshape in ViTAttention splits exactly on those column blocks.

CLI: ``python -m crossscore_tpu.io.torch_convert <ckpt.ckpt|hf_dir> <out_dir>``
writes an orbax checkpoint loadable by crossscore_tpu.io.checkpoint.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def state_dict_to_numpy(state_dict) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _dense(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _ln(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_hf_dinov2(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """HF Dinov2Model state_dict (numpy) -> Dinov2Encoder param tree."""
    conv_w = sd["embeddings.patch_embeddings.projection.weight"]  # (D, 3, P, P)
    d, _, p, _ = conv_w.shape
    params: dict = {
        "patch_proj": {
            "kernel": conv_w.transpose(2, 3, 1, 0).reshape(p * p * 3, d),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "final_ln": _ln(sd, "layernorm"),
    }
    for i in range(num_layers):
        pre = f"encoder.layer.{i}"
        qkv_kernel = np.concatenate(
            [
                sd[f"{pre}.attention.attention.query.weight"].T,
                sd[f"{pre}.attention.attention.key.weight"].T,
                sd[f"{pre}.attention.attention.value.weight"].T,
            ],
            axis=1,
        )
        qkv_bias = np.concatenate(
            [
                sd[f"{pre}.attention.attention.query.bias"],
                sd[f"{pre}.attention.attention.key.bias"],
                sd[f"{pre}.attention.attention.value.bias"],
            ]
        )
        params[f"block_{i}"] = {
            "ln1": _ln(sd, f"{pre}.norm1"),
            "attn": {
                "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                "out": _dense(sd, f"{pre}.attention.output.dense"),
            },
            "ls1": sd[f"{pre}.layer_scale1.lambda1"],
            "ln2": _ln(sd, f"{pre}.norm2"),
            "fc1": _dense(sd, f"{pre}.mlp.fc1"),
            "fc2": _dense(sd, f"{pre}.mlp.fc2"),
            "ls2": sd[f"{pre}.layer_scale2.lambda1"],
        }
    return params


def _convert_torch_mha(sd: Mapping[str, np.ndarray], prefix: str, d_model: int) -> dict:
    """torch.nn.MultiheadAttention (packed in_proj) -> TorchStyleMHA tree."""
    w = sd[f"{prefix}.in_proj_weight"]  # (3D, D)
    b = sd[f"{prefix}.in_proj_bias"]  # (3D,)
    return {
        "q_proj": {"kernel": w[:d_model].T, "bias": b[:d_model]},
        "k_proj": {"kernel": w[d_model : 2 * d_model].T, "bias": b[d_model : 2 * d_model]},
        "v_proj": {"kernel": w[2 * d_model :].T, "bias": b[2 * d_model :]},
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def convert_decoder(
    sd: Mapping[str, np.ndarray],
    prefix: str,
    num_layers: int,
    d_model: int,
    do_self_attn: bool = True,
) -> dict:
    """torch TransformerDecoder(Customised) -> CrossReferenceDecoder tree."""
    out: dict = {}
    root = f"{prefix}." if prefix else ""
    for i in range(num_layers):
        pre = f"{root}layers.{i}"
        layer: dict = {}
        if do_self_attn:
            layer["self_attn"] = _convert_torch_mha(sd, f"{pre}.self_attn", d_model)
            layer["norm1"] = _ln(sd, f"{pre}.norm1")
        layer["cross_attn"] = _convert_torch_mha(sd, f"{pre}.multihead_attn", d_model)
        layer["norm2"] = _ln(sd, f"{pre}.norm2")
        layer["linear1"] = _dense(sd, f"{pre}.linear1")
        layer["linear2"] = _dense(sd, f"{pre}.linear2")
        layer["norm3"] = _ln(sd, f"{pre}.norm3")
        out[f"layer_{i}"] = layer
    return out


def convert_lightning_ckpt(
    sd: Mapping[str, np.ndarray],
    num_backbone_layers: int = 12,
    num_decoder_layers: int = 2,
    d_model: int = 384,
    do_self_attn: bool = True,
) -> dict:
    """Full reference Lightning state_dict -> CrossScoreNet param tree.

    Accepts either raw ``state_dict`` keys (``model.backbone....``) or a full
    Lightning checkpoint dict (looks under the ``state_dict`` key first).
    """
    backbone_sd = {k[len("model.backbone.") :]: v for k, v in sd.items() if k.startswith("model.backbone.")}
    params = {
        "backbone": convert_hf_dinov2(backbone_sd, num_backbone_layers),
        "pos_enc": {"pe": sd["model.pos_enc_fn.PE"][0]},  # (1,H,W,C) -> (H,W,C)
        "decoder": convert_decoder(
            sd, "model.ref_cross.attn", num_decoder_layers, d_model, do_self_attn
        ),
        "head_fc1": {"kernel": sd["model.ref_cross.head.0.weight"].T, "bias": sd["model.ref_cross.head.0.bias"]},
        "head_fc2": {"kernel": sd["model.ref_cross.head.2.weight"].T, "bias": sd["model.ref_cross.head.2.bias"]},
    }
    return params


# ---------------------------------------------------------------------------
# Reverse direction: flax param tree -> reference Lightning state_dict.
#
# Blob-day interop runs both ways: a TPU-trained decoder/head must be loadable
# by the reference stack (reference ``task/core.py`` state-dict naming:
# ``model.backbone.<HF names>``, ``model.pos_enc_fn.PE``,
# ``model.ref_cross.attn.layers.{i}.*`` with torch's packed ``in_proj_weight``,
# ``model.ref_cross.head.{0,2}.*``) for independent validation. Every mapping
# below is the exact inverse of the forward converter above — pinned by a
# byte-equality round-trip test (tests/test_model_parity.py).
# ---------------------------------------------------------------------------


def _rev_dense(tree: Mapping[str, np.ndarray], out: dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(tree["kernel"].T)
    out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def _rev_ln(tree: Mapping[str, np.ndarray], out: dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = np.asarray(tree["scale"])
    out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def revert_hf_dinov2(params: Mapping) -> dict[str, np.ndarray]:
    """Dinov2Encoder param tree -> HF ``Dinov2Model`` state_dict (numpy).

    Inverse of :func:`convert_hf_dinov2`. The HF ``embeddings.mask_token``
    has no flax counterpart (it only participates in masked-image modelling,
    never in inference); it is emitted as zeros so ``load_state_dict`` under
    ``strict=True`` succeeds."""
    kern = np.asarray(params["patch_proj"]["kernel"])  # (P*P*3, D)
    d = kern.shape[1]
    p = int(round((kern.shape[0] // 3) ** 0.5))
    sd: dict[str, np.ndarray] = {
        "embeddings.patch_embeddings.projection.weight": np.ascontiguousarray(
            kern.reshape(p, p, 3, d).transpose(3, 2, 0, 1)
        ),
        "embeddings.patch_embeddings.projection.bias": np.asarray(params["patch_proj"]["bias"]),
        "embeddings.cls_token": np.asarray(params["cls_token"]),
        "embeddings.mask_token": np.zeros((1, d), np.float32),
        "embeddings.position_embeddings": np.asarray(params["pos_embed"]),
    }
    _rev_ln(params["final_ln"], sd, "layernorm")
    n_layers = sum(1 for k in params if str(k).startswith("block_"))
    for i in range(n_layers):
        blk = params[f"block_{i}"]
        pre = f"encoder.layer.{i}"
        qkv = np.asarray(blk["attn"]["qkv"]["kernel"])  # (D, 3D)
        qkv_b = np.asarray(blk["attn"]["qkv"]["bias"])  # (3D,)
        for j, name in enumerate(("query", "key", "value")):
            sd[f"{pre}.attention.attention.{name}.weight"] = np.ascontiguousarray(
                qkv[:, j * d : (j + 1) * d].T
            )
            sd[f"{pre}.attention.attention.{name}.bias"] = qkv_b[j * d : (j + 1) * d]
        _rev_dense(blk["attn"]["out"], sd, f"{pre}.attention.output.dense")
        _rev_ln(blk["ln1"], sd, f"{pre}.norm1")
        _rev_ln(blk["ln2"], sd, f"{pre}.norm2")
        _rev_dense(blk["fc1"], sd, f"{pre}.mlp.fc1")
        _rev_dense(blk["fc2"], sd, f"{pre}.mlp.fc2")
        sd[f"{pre}.layer_scale1.lambda1"] = np.asarray(blk["ls1"])
        sd[f"{pre}.layer_scale2.lambda1"] = np.asarray(blk["ls2"])
    return sd


def _rev_torch_mha(tree: Mapping, out: dict, prefix: str) -> None:
    """TorchStyleMHA tree -> packed ``in_proj_weight`` layout (inverse of
    :func:`_convert_torch_mha`: q/k/v kernels are (D, D) column blocks of the
    transposed packed weight, so the packed rows are their transposes)."""
    out[f"{prefix}.in_proj_weight"] = np.ascontiguousarray(
        np.concatenate(
            [np.asarray(tree[k]["kernel"]).T for k in ("q_proj", "k_proj", "v_proj")],
            axis=0,
        )
    )
    out[f"{prefix}.in_proj_bias"] = np.concatenate(
        [np.asarray(tree[k]["bias"]) for k in ("q_proj", "k_proj", "v_proj")]
    )
    _rev_dense(tree["out_proj"], out, f"{prefix}.out_proj")


def revert_decoder(params: Mapping, prefix: str) -> dict[str, np.ndarray]:
    """CrossReferenceDecoder tree -> torch TransformerDecoder(Customised)."""
    sd: dict[str, np.ndarray] = {}
    root = f"{prefix}." if prefix else ""
    n_layers = sum(1 for k in params if str(k).startswith("layer_"))
    for i in range(n_layers):
        layer = params[f"layer_{i}"]
        pre = f"{root}layers.{i}"
        if "self_attn" in layer:
            _rev_torch_mha(layer["self_attn"], sd, f"{pre}.self_attn")
            _rev_ln(layer["norm1"], sd, f"{pre}.norm1")
        _rev_torch_mha(layer["cross_attn"], sd, f"{pre}.multihead_attn")
        _rev_ln(layer["norm2"], sd, f"{pre}.norm2")
        _rev_dense(layer["linear1"], sd, f"{pre}.linear1")
        _rev_dense(layer["linear2"], sd, f"{pre}.linear2")
        _rev_ln(layer["norm3"], sd, f"{pre}.norm3")
    return sd


def revert_lightning_ckpt(params: Mapping) -> dict[str, np.ndarray]:
    """CrossScoreNet param tree -> reference Lightning ``state_dict`` (numpy).

    Inverse of :func:`convert_lightning_ckpt`, plus the reference's
    ``model.img_mean_std`` buffer (reference ``task/core.py:33-36`` registers
    the ImageNet [mean..., std...] constants) so ``strict=True`` loads pass.
    """
    from crossscore_tpu.io.images import IMAGENET_MEAN, IMAGENET_STD

    sd: dict[str, np.ndarray] = {
        "model.img_mean_std": np.asarray([*IMAGENET_MEAN, *IMAGENET_STD], np.float32),
        "model.pos_enc_fn.PE": np.asarray(params["pos_enc"]["pe"])[None],
    }
    for k, v in revert_hf_dinov2(params["backbone"]).items():
        sd[f"model.backbone.{k}"] = v
    sd.update(revert_decoder(params["decoder"], "model.ref_cross.attn"))
    _rev_dense(params["head_fc1"], sd, "model.ref_cross.head.0")
    _rev_dense(params["head_fc2"], sd, "model.ref_cross.head.2")
    return sd


def save_lightning_ckpt(path: str, params: Mapping) -> None:
    """Write a reference-stack-loadable Lightning ``.ckpt`` from flax params."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v, dtype=np.float32))
          for k, v in revert_lightning_ckpt(params).items()}
    torch.save(
        {
            "state_dict": sd,
            # minimal Lightning envelope: enough for Trainer ckpt_path loads
            "pytorch-lightning_version": "2.1.3",
            "epoch": 0,
            "global_step": 0,
            "loops": {},
        },
        path,
    )


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """torch.load a Lightning ckpt and return its numpy state_dict."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return state_dict_to_numpy(sd)


def main(argv=None) -> None:
    import argparse

    from crossscore_tpu.io.checkpoint import save_params

    ap = argparse.ArgumentParser(description="Convert a torch CrossScore ckpt to orbax")
    ap.add_argument("ckpt", help="Lightning .ckpt file, or (with --hf-backbone) a "
                                 "HuggingFace Dinov2 model dir / name")
    ap.add_argument("out_dir", help="orbax checkpoint output directory")
    ap.add_argument("--backbone-layers", type=int, default=12)
    ap.add_argument("--decoder-layers", type=int, default=2)
    ap.add_argument("--d-model", type=int, default=384)
    ap.add_argument(
        "--hf-backbone",
        action="store_true",
        help="convert only a HF Dinov2Model backbone (for model.backbone.init_path)",
    )
    ap.add_argument(
        "--reverse",
        action="store_true",
        help="reverse direction: ckpt = an orbax params dir, out_dir = the "
             "Lightning .ckpt FILE to write (loadable by the reference stack)",
    )
    args = ap.parse_args(argv)

    if args.reverse:
        # host-side restore: a TPU-written checkpoint must convert on any
        # host (load_params would pin to the saving platform's devices)
        from crossscore_tpu.io.checkpoint import load_params_host

        tree = load_params_host(args.ckpt)
        if isinstance(tree, dict) and "params" in tree:
            tree = tree["params"]  # a full TrainState checkpoint: use params
        save_lightning_ckpt(args.out_dir, tree)
        print(f"Reverted {args.ckpt} -> {args.out_dir}")
        return
    if args.hf_backbone:
        from transformers import Dinov2Model

        model = Dinov2Model.from_pretrained(args.ckpt)
        sd = state_dict_to_numpy(model.state_dict())
        params = convert_hf_dinov2(sd, model.config.num_hidden_layers)
    else:
        sd = load_torch_checkpoint(args.ckpt)
        params = convert_lightning_ckpt(
            sd, args.backbone_layers, args.decoder_layers, args.d_model
        )
    save_params(args.out_dir, params)
    print(f"Converted {args.ckpt} -> {args.out_dir}")


if __name__ == "__main__":
    main()

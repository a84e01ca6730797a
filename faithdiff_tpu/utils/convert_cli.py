"""Checkpoint conversion CLI.

Converts the reference's torch checkpoints into this framework's orbax
param trees, mirroring the factory load path
(`/root/reference/FaithDiff/create_FaithDiff_model.py:11-37`):

  python -m faithdiff_tpu.utils.convert_cli \
      --sdxl_dir /path/RealVisXL_V4.0 \
      --faithdiff_bin /path/FaithDiff.bin \
      --vae_dir /path/sdxl-vae-fp16-fix \
      --out_dir ckpts/

Writes out_dir/{unet,vae,denoise_encoder,text_encoders}/ orbax checkpoints
consumable by `cli.py restore --checkpoint_dir out_dir`.
"""
from __future__ import annotations

import argparse
import glob
import os


def _load_any(path_or_dir: str, subfolder: str = ""):
    from .convert import load_safetensors, load_torch_bin

    base = os.path.join(path_or_dir, subfolder) if subfolder else path_or_dir
    cands = (
        glob.glob(os.path.join(base, "*.safetensors"))
        + glob.glob(os.path.join(base, "*.bin"))
    )
    if os.path.isfile(base):
        cands = [base]
    if not cands:
        raise FileNotFoundError(f"no checkpoint under {base}")
    merged = {}
    for c in sorted(cands):
        if c.endswith(".safetensors"):
            merged.update(load_safetensors(c))
        else:
            merged.update(load_torch_bin(c))
    return merged


def main(argv=None):
    p = argparse.ArgumentParser("convert")
    p.add_argument("--sdxl_dir", required=True,
                   help="diffusers SDXL repo dir (unet/, text_encoder*/)")
    p.add_argument("--faithdiff_bin", default=None)
    p.add_argument("--vae_dir", default=None)
    p.add_argument("--out_dir", required=True)
    args = p.parse_args(argv)

    from ..training.checkpoint import save_params
    from .convert import (convert_clip_text, convert_denoise_encoder,
                          convert_faithdiff_unet, convert_unet, convert_vae,
                          split_faithdiff_bin)

    os.makedirs(args.out_dir, exist_ok=True)

    unet_sd = _load_any(args.sdxl_dir, "unet")
    if args.faithdiff_bin:
        fd_sd = _load_any(args.faithdiff_bin)
        core, extras = split_faithdiff_bin(fd_sd)
        # FaithDiff.bin core keys override the base SDXL UNet (non-strict
        # core load in the reference, `unet_2d_condition_vae_extension.py:474`)
        unet_sd = {**unet_sd, **core}
        unet_params = convert_faithdiff_unet(unet_sd, extras)
        save_params(os.path.join(args.out_dir, "denoise_encoder"),
                    convert_denoise_encoder(extras["denoise_encoder"]))
    else:
        unet_params = convert_unet(unet_sd)
    save_params(os.path.join(args.out_dir, "unet"), unet_params)

    if args.vae_dir:
        save_params(os.path.join(args.out_dir, "vae"),
                    convert_vae(_load_any(args.vae_dir)))

    te = {}
    for name, sub, proj in (("text_encoder", "text_encoder", False),
                            ("text_encoder_2", "text_encoder_2", True)):
        try:
            sd = _load_any(args.sdxl_dir, sub)
            te[name] = convert_clip_text(sd, with_projection=proj)
        except FileNotFoundError:
            pass
    if te:
        save_params(os.path.join(args.out_dir, "text_encoders"), te)
    print(f"converted checkpoints -> {args.out_dir}")


if __name__ == "__main__":
    main()


def export_main(argv=None):
    """Export trained orbax params back to the reference FaithDiff.bin
    layout (torch state dict): core UNet + fusion extras + denoise_encoder
    under their reference namespaces (`unet_2d_condition_vae_extension.py:
    444-478` inverse)."""
    p = argparse.ArgumentParser("export")
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--out", required=True, help="output .bin path")
    args = p.parse_args(argv)

    import torch

    from ..training.checkpoint import load_params
    from .convert import export_to_torch_state_dict

    unet_params = load_params(os.path.join(args.checkpoint_dir, "unet"))
    sd = export_to_torch_state_dict(unet_params)
    de_dir = os.path.join(args.checkpoint_dir, "denoise_encoder")
    if os.path.exists(de_dir):
        de_params = load_params(de_dir)
        de_sd = export_to_torch_state_dict(de_params.get("encoder", de_params))
        sd.update({f"denoise_encoder.{k}": v for k, v in de_sd.items()})
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
               args.out)
    print(f"exported {len(sd)} tensors -> {args.out}")

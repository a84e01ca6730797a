"""CLI surface tests: restore end-to-end with tiny configs, flag parity."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from faithdiff_tpu.cli import main


def test_cli_usage_message(capsys):
    rc = main([])
    assert rc == 1
    assert "restore" in capsys.readouterr().out


def test_cli_restore_tiny_end_to_end(tmp_path):
    img_dir = tmp_path / "in"
    save_dir = tmp_path / "out"
    json_dir = tmp_path / "caps"
    img_dir.mkdir()
    json_dir.mkdir()
    rng = np.random.default_rng(0)
    # deliberately non-/8 size: the CLI must pad and crop back
    Image.fromarray(rng.integers(0, 255, (30, 31, 3), np.uint8)).save(
        img_dir / "a.png")
    with open(json_dir / "a.json", "w") as f:
        json.dump({"caption": "one two three a nice photo. of a cat. x."}, f)

    main(["restore", "--img_dir", str(img_dir), "--save_dir", str(save_dir),
          "--json_dir", str(json_dir), "--tiny", "--upscale", "2",
          "--num_inference_steps", "2", "--latent_tiled_size", "64"])
    out_path = save_dir / "a.png"
    assert out_path.exists()
    out = np.asarray(Image.open(out_path))
    assert out.shape == (60, 62, 3)  # 2x upscale, padding cropped

    # skip-if-exists resume: second run leaves the file untouched
    mtime = os.path.getmtime(out_path)
    main(["restore", "--img_dir", str(img_dir), "--save_dir", str(save_dir),
          "--json_dir", str(json_dir), "--tiny", "--upscale", "2",
          "--num_inference_steps", "2", "--latent_tiled_size", "64"])
    assert os.path.getmtime(out_path) == mtime

from .factory import build_pipeline, build_tiny_pipeline
from .faithdiff import FaithDiffPipeline, rescale_noise_cfg
from .tiling import (TileLayout, compute_tile_layout, gaussian_tile_weights,
                     merge_tiles, pad_for_tiles, split_tiles,
                     tile_position_ids)

__all__ = [
    "build_pipeline", "build_tiny_pipeline", "FaithDiffPipeline",
    "rescale_noise_cfg", "TileLayout", "compute_tile_layout",
    "gaussian_tile_weights", "merge_tiles", "pad_for_tiles", "split_tiles",
    "tile_position_ids",
]

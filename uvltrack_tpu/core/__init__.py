from . import box_ops, geometry, hann, heatmap, tokenizer

__all__ = ["box_ops", "geometry", "hann", "heatmap", "tokenizer"]

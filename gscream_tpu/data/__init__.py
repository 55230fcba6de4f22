"""Data layer: COLMAP parsing, SPIN-NeRF reader, spiral paths, synthetic scenes."""

"""Scaffold-GS model layer: anchor state, MLP decoders, densification."""

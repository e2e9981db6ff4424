"""Training engine: trainer, masking curriculum, tiled evaluation."""

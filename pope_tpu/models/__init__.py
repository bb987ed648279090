"""Model families: matcher (LoFTR-style), dinov2 (ViT-S/14 retrieval), sam
(promptable segmentation + AMG), regressor (pose-regression extension)."""

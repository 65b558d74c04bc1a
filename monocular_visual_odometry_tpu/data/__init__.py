"""Datasets: synthetic benchmark generation (exact ground truth) and
image-folder loading in the reference's ``rgb_%05d.png`` layout."""

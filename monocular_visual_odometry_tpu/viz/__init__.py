"""Offline visualization (replaces the reference's interactive PCL/OpenCV
windows, SURVEY.md §8.1): trajectory plots and annotated frames exported
as image files."""

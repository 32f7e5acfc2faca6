"""Dataset loaders: Blender, LLFF, Multicam, and the 64-byte bin-record dump."""

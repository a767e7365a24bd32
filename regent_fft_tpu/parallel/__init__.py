"""Distributed transforms over device meshes."""

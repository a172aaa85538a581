"""Multimodal (binary media) column plumbing."""

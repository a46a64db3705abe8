"""Multimodal (image/audio/video) columns: binary payload + typed metadata."""

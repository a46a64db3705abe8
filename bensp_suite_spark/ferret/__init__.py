"""Ferret: content-based similarity-search pipeline (reference: apps/ferret)."""

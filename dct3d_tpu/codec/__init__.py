"""Codec pipelines: framing, device transform steps, entropy, streaming drivers."""

"""Batch operators / pipelines.

OSM-domain (reference parity): preprocess, geometry, geocode, stats, rollups,
vectorgrid. LLM-data-pipeline extensions: dedup, similarity, textops,
multimodal.
"""

"""Sources: deterministic synthetic generators (corpus of image+caption
pairs, the synthetic web graph) and table catalog helpers.
"""

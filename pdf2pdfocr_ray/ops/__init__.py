"""Operator modules (import directly; see package __init__ for why this
is not a re-export surface): grouped, relational, dedup, similarity,
sketches, text_analysis, multimodal, graph."""

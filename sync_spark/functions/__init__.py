"""Scalar function layer: field security (mask/encrypt), JSON helpers,
text analysis, vector math."""

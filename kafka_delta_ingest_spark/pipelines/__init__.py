"""Composed multi-operator pipelines over the single-purpose operators."""

"""Flagship user-facing models built on the ops/mc layers."""

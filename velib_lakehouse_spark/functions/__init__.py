"""Reusable column/expression helpers shared by the operators."""

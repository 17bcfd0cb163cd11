"""Operator library: relational parity ops + scale extensions."""

"""Scalar/text function library (the reference has no scalar functions
at all — src/qp/parser/parser.cup:197-255; everything here is
capability-extension for LLM-data-pipeline workloads)."""

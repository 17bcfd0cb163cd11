"""Plan-level tooling: reference-dialect SQL translation and plan
inspection helpers."""

"""Shared utilities: limb packing, tracing, config."""

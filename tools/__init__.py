"""Dev tools (oracle harness, plan audit, scaling probe)."""

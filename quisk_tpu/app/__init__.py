"""Application layer: config system, graph service, CLI runner."""

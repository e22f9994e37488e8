"""Training orchestration: metrics, module, trainer loop, CLI."""

"""Multi-chip / multi-host scaling: mesh setup and sharded train steps."""

"""datasets subsystem."""

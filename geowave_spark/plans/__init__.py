"""Query planning (constraints → broadcast cover join) and checkpointing."""

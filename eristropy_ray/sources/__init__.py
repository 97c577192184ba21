"""Sources: transcript synthesis, readers and table adapters."""

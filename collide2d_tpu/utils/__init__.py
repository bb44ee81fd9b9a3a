"""Host-side utilities: npy IO, directory helpers, configs, native runtime."""

"""CLI entry points (console scripts m2tts-*)."""

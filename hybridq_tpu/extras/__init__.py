"""Extras: random circuits, OTOC workloads, IO, debug gates."""

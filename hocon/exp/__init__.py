"""Experiment utilities (reference: libyana exputils subset — SURVEY.md §2.2)."""

from hocon.exp.args import save_args

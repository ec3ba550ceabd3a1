"""Utilities: diagnostics, model summary, numeric grad checking, init."""

from .diagnostics import print_diagnostics
from .gradcheck import gradcheck
from .summary import count_params, summary

__all__ = ["print_diagnostics", "gradcheck", "count_params", "summary"]

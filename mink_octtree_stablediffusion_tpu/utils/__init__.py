"""Utilities: diagnostics, model summary, numeric grad checking, init."""

from .diagnostics import backend_differential_suite, backend_selfcheck, get_device_memory_info, print_diagnostics
from .gradcheck import gradcheck
from .torch_import import convert_module, load_torch_state_dict, strip_prefix
from .profiling import Timer, synced_time, trace
from .summary import capacity_report, count_params, summary
from .viz import render_pointclouds, sparse_tensor_clouds

__all__ = ["backend_differential_suite", "backend_selfcheck", "get_device_memory_info", "print_diagnostics", "gradcheck", "capacity_report", "count_params", "summary",
           "render_pointclouds", "sparse_tensor_clouds", "Timer",
           "synced_time", "trace", "convert_module", "load_torch_state_dict",
           "strip_prefix"]

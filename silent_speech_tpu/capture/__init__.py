"""Data-collection tooling: EMG+audio capture, prompting UI, audio cleaning.

Equivalent of the reference's ``data_collection/`` tree (SURVEY.md §2.1):
hardware capture is host-side and TPU-irrelevant, but it defines the on-disk
dataset schema every loader consumes, so the framework carries it. Hardware
backends (OpenBCI via BrainFlow, microphones via sounddevice) are optional
imports; a synthetic board — the reference's debug backend
(``record_data.py:63-65``) — always works.
"""

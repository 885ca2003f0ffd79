"""End-to-end pipeline models."""

from .pipeline import SARChangePipeline, multilook, change_features

__all__ = ['SARChangePipeline', 'multilook', 'change_features']

from .feature_group import FeatureDefinition, FeatureGroup
from .feature_store import FeatureStore

__all__ = ["FeatureDefinition", "FeatureGroup", "FeatureStore"]

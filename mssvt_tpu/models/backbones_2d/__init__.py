from .base_bev_backbone import BaseBEVBackbone
from .map_to_bev import HeightCompression, PointPillarScatter

__all__ = ["BaseBEVBackbone", "HeightCompression", "PointPillarScatter"]

from .meters import AvgMeter

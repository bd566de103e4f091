from .xdeepfm import xDeepFM

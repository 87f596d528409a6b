"""Dataset zoo: Cora, six temporal sets, England-COVID dynamic graphs.

API-parity with the reference ``stgraph/dataset/`` (same loader names,
URLs, cache layout, gdata keys) plus deterministic synthetic fallbacks for
air-gapped environments (``base.STGraphDataset._acquire``).
"""

from stgraph_tpu.dataset.base import (
    STGraphDataset,
    STGraphDynamicDataset,
    STGraphStaticDataset,
    STGraphTemporalDataset,
)
from stgraph_tpu.dataset.cora_dataloader import CoraDataLoader
from stgraph_tpu.dataset.england_covid_dataloader import EnglandCovidDataLoader
from stgraph_tpu.dataset.hungarycp_dataloader import HungaryCPDataLoader
from stgraph_tpu.dataset.metrla_dataloader import METRLADataLoader
from stgraph_tpu.dataset.montevideobus_dataloader import MontevideoBusDataLoader
from stgraph_tpu.dataset.ogb_dataloader import OgbNodeDataLoader
from stgraph_tpu.dataset.pedalme_dataloader import PedalMeDataLoader
from stgraph_tpu.dataset.pubmed_dataloader import PubmedDataLoader
from stgraph_tpu.dataset.wikimath_dataloader import WikiMathDataLoader
from stgraph_tpu.dataset.windmilloutput_dataloader import WindmillOutputDataLoader

__all__ = [
    "CoraDataLoader",
    "EnglandCovidDataLoader",
    "HungaryCPDataLoader",
    "METRLADataLoader",
    "MontevideoBusDataLoader",
    "OgbNodeDataLoader",
    "PedalMeDataLoader",
    "PubmedDataLoader",
    "STGraphDataset",
    "STGraphDynamicDataset",
    "STGraphStaticDataset",
    "STGraphTemporalDataset",
    "WikiMathDataLoader",
    "WindmillOutputDataLoader",
]

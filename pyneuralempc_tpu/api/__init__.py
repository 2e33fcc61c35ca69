from .controller import NMPC, NMPCResult, WarmStart

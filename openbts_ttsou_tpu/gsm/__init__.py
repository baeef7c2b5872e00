"""GSM bit-level stack: FEC, TDMA mappings, bursts/frames (reference: GSM/)."""

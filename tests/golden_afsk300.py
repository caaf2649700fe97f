"""Golden packet sets for the bundled fixture WAV.

Captured from reference runs (python3 pymodem.py <config> <wav>) on
audio_samples/afsk_300_il2pc_noise.wav, 2026-08-16:

* configs/afsk_300_pll.json  -> 48 unique valid packets, 0 CRC rejects
* configs/afsk_300.json      -> 49 unique valid packets, 6 CRC rejects

Each entry is (streamaddress, calculated_crc) of a unique valid packet in
report order (sorted by streamaddress, packet_meta.py:261).
"""

GOLDEN_PLL = [
    (25571, 0x6BD8), (50534, 0x26FB), (75497, 0x65F9), (100459, 0x3266),
    (125422, 0xCEAB), (150377, 0x5C64), (175316, 0x0E1B), (200283, 0x3F67),
    (225230, 0x59E2), (250173, 0x344B), (275116, 0xCBDB), (300073, 0x830A),
    (325021, 0xACDB), (349982, 0x880A), (374940, 0x02D0), (399885, 0xF914),
    (424845, 0xD5EF), (449781, 0x1C73), (474724, 0x17D8), (499683, 0x573F),
    (524650, 0x3895), (549592, 0x9AD0), (574548, 0xE6F2), (599511, 0xE952),
    (624443, 0x2746), (649186, 0xE37D), (674156, 0x04B7), (699115, 0xA0A5),
    (724073, 0xB139), (749032, 0x83C4), (773996, 0x1923), (798951, 0xC775),
    (823892, 0xB214), (848858, 0xB569), (873793, 0x0BD0), (898732, 0x8344),
    (923703, 0x0288), (948668, 0x6E91), (973614, 0x637D), (998760, 0xF2B5),
    (1023507, 0xD1BB), (1048478, 0xE88C), (1073438, 0x82CA), (1098371, 0x15D5),
    (1123333, 0xA1F3), (1173221, 0xABE7), (1223141, 0x3CAF), (1248101, 0x24BB),
]

GOLDEN_5CHAIN = [
    (25594, 0x6BD8), (50556, 0x26FB), (75517, 0x65F9), (100480, 0x3266),
    (125413, 0xCEAB), (150373, 0x5C64), (175315, 0x0E1B), (200279, 0x3F67),
    (225222, 0x59E2), (250193, 0x344B), (275138, 0xCBDB), (300096, 0x830A),
    (325044, 0xACDB), (350000, 0x880A), (374959, 0x02D0), (399905, 0xF914),
    (424837, 0xD5EF), (449806, 0x1C73), (474772, 0x17D8), (499731, 0x573F),
    (524667, 0x3895), (549610, 0x9AD0), (574569, 0xE6F2), (599531, 0xE952),
    (624274, 0x2746), (649233, 0xE37D), (674175, 0x04B7), (699134, 0xA0A5),
    (724093, 0xB139), (749052, 0x83C4), (774013, 0x1923), (798971, 0xC775),
    (823910, 0xB214), (848877, 0xB569), (873814, 0x0BD0), (898779, 0x8344),
    (923722, 0x0288), (948688, 0x6E91), (973632, 0x637D), (998593, 0xF2B5),
    (1023551, 0xD1BB), (1048496, 0xE88C), (1073457, 0x82CA), (1098371, 0x15D5),
    (1123350, 0xA1F3), (1148310, 0x7EEF), (1173268, 0xABE7), (1223141, 0x3CAF),
    (1248101, 0x24BB),
]

GOLDEN_5CHAIN_BAD = 6  # CRC-rejected frames across all chains
GOLDEN_PLL_BAD = 0

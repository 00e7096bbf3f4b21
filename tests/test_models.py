"""Pin the curve/field constants against the reference's published
decimal strings (mnt4753_init.cpp:47-203, mnt6753_init.cpp:49-219),
hard-copied here as data.  This breaks the oracle/framework common-mode
loop: tools/oracle.py imports models/primes.py, so a wrong constant
would otherwise pass the e2e byte-exact tests while disagreeing with
the real libsnark binary."""

import numpy as np

from snark_challenge_prover_tpu.models import mnt4753, mnt6753
from snark_challenge_prover_tpu.models.primes import (
    FIELD_A,
    FIELD_B,
    FIELD_B_SMALL,
    P_MNT4_Q,
    P_MNT4_R,
)
from snark_challenge_prover_tpu.utils.bigint import limbs_to_int

# ---- reference decimal strings (data, not code) --------------------------
# mnt4753_init.cpp:48 / mnt6753_init.cpp:79
MODULUS_R4 = int(
    "41898490967918953402344214791240637128170709919953949071783502921025352"
    "81257110677305889376379033892141807097188845847732317305749159385506969"
    "6241854796396165721416325350064441470418137846398469611935719059908164220784476160001"
)
# mnt4753_init.cpp:77 / mnt6753_init.cpp:50
MODULUS_Q4 = int(
    "41898490967918953402344214791240637128170709919953949071783502921025352"
    "81257110677305889376379033892141807097188825378611435372652958438520159"
    "1605722013126468931404347949840543007986327743462853720628051692141265303114721689601"
)
# mnt4753_init.cpp:52 (Fr Rsquared)
R2_R4 = int(
    "52829424748979447883089205347265922577825186252717727399645853617820224"
    "99356115325986263008638821785457143587895688059118177555384132502448662"
    "01145158388475219888075448690235278457757610027799964891022754525136858589282224337"
)
# mnt4753_init.cpp:82 (Fq Rsquared)
R2_Q4 = int(
    "39053297678287916155021626268502118186557140944586901204309865757926774"
    "96633802118724780745619552999481121157852051288948780064150889938934414"
    "916554522736667272858589954728849781314241493825915233155383114266348177232527200456"
)
INV64_R4 = 0xC90776E23FFFFFFF  # mnt4753_init.cpp:54
INV32_R4 = 0x3FFFFFFF          # mnt4753_init.cpp:60
INV64_Q4 = 0xF2044CFBE45E7FFF  # mnt4753_init.cpp:84
INV32_Q4 = 0xE45E7FFF          # mnt4753_init.cpp:90
S_R4 = 30  # mnt4753_init.cpp:66
S_Q4 = 15  # mnt4753_init.cpp:93
# mnt4753_init.cpp:67
T_R4 = int(
    "39021010480745652133919498688765463538626870065884617224134041854204007"
    "24985739846998722643013143811506970876072389863182154768844283544930601"
    "1425196003537779414482717728302293895201885929702287178426719326440397855625"
)
# mnt4753_init.cpp:70
ROOT_OF_UNITY_R4 = int(
    "54315485646517727708633762091905333217437660060808743454210170905761699"
    "20304713950094628043692772801995471539849411522704471393987882883355624"
    "697206026582300050878644000631322086989454860102191886653186986980927065212650747291"
)
# mnt4753_init.cpp:96 == mnt6753_init.cpp:70 (Fr(MNT6753) root_of_unity)
ROOT_OF_UNITY_Q4 = int(
    "40577822398412982719876671814347622311725878559400100565221223860226396"
    "93483011237665982243031769223244088301022503388079382887473071172123432"
    "5694240460855741763791540474706150170374090550695427806583236301930157866709353840964"
)
# mnt6753_init.cpp:76
FULL_ROOT_OF_UNITY_R6 = int(
    "12249458902762217747626832919710926618510011455364963726393752854649914"
    "97995413810997633160145544878025116604520305350852334211162458398686930"
    "1658366625356826888785691823710598470775453742133593634524619429629803955083254436531"
)
NQR_R4 = 11  # mnt4753_init.cpp:71
NQR_Q4 = 13  # mnt4753_init.cpp:97
GENERATOR = 17  # both fields, both curves

# mnt4753_init.cpp:119-120
G1_A_M4 = 2
G1_B_M4 = int(
    "28798803903456388891410036793299405764940372360099938340752576406393880"
    "37212697006842138331248285354157278008736393844237793370686525205350707"
    "7543420534380486492786626556269083255657125025963825610840222568694137138741554679540"
)
# mnt6753_init.cpp:130-131
G1_A_M6 = 11
G1_B_M6 = int(
    "11625908999541321152027340224010374716841167701783584648338908235410859"
    "26706007981972274793926792538906261106215660193816601009874792037873892"
    "7832658133625454260115409075816187555055859490253375704728027944315501122723426879114"
)
# mnt4753_init.cpp:131-132 (Frobenius twist multipliers, used by mul_by_q)
TWIST_MUL_BY_Q_X_M4 = MODULUS_Q4 - 1
TWIST_MUL_BY_Q_Y_M4 = int(
    "18691656569803771296244054523431852464958959799019013859007259692542121"
    "20830460253955535051707550828782975393255857647675190023565022738056270"
    "0444433662761577027341858128610410779088384480737679672900770810745291515010467307990"
)
# mnt6753_init.cpp:146-147
TWIST_MUL_BY_Q_X_M6 = int(
    "17769468560101711995209951371304522748355002843010440790806134764399814"
    "10346827495821531098365137580161092789021088875536961125641597011369106"
    "6895445191924931148019336171640277697829047741006062493737919155152541323243293107868"
)
TWIST_MUL_BY_Q_Y_M6 = MODULUS_R4 - 1
# mnt6753_init.cpp:110-112 (Fq3 Frobenius coeffs c1)
FROB_C1_1_M6 = int(
    "24129022407817241407134263419936114379815707076943508280977368156625538"
    "70910283181484358278013896311980714308167756972195356180107562374137862"
    "9346409604471234573396989178424163772589090105392407118197799904755622897541183052132"
)
FROB_C1_2_M6 = TWIST_MUL_BY_Q_X_M6


def _planes_to_int(F, planes):
    return F.spec.from_mont(limbs_to_int(np.asarray(planes)))


def test_primes_match_reference():
    assert P_MNT4_R == MODULUS_R4
    assert P_MNT4_Q == MODULUS_Q4
    assert MODULUS_R4.bit_length() == 753 and MODULUS_Q4.bit_length() == 753


def test_montgomery_constants_match_reference():
    # R = 2^768 on both sides (12x64 there, 48x16 here)
    assert FIELD_A.R2 == R2_R4
    assert FIELD_B.R2 == R2_Q4
    assert FIELD_A.n_prime % (1 << 64) == INV64_R4
    assert FIELD_A.n_prime % (1 << 32) == INV32_R4
    assert FIELD_B.n_prime % (1 << 64) == INV64_Q4
    assert FIELD_B.n_prime % (1 << 32) == INV32_Q4


def test_two_adicity_and_roots_match_reference():
    assert FIELD_A.s == S_R4 and FIELD_A.t == T_R4
    assert FIELD_B.s == S_Q4
    assert FIELD_A.root_of_unity == ROOT_OF_UNITY_R4
    assert FIELD_B.root_of_unity == ROOT_OF_UNITY_Q4
    assert FIELD_A.multiplicative_generator == GENERATOR
    assert FIELD_B.multiplicative_generator == GENERATOR
    assert FIELD_A.nqr == NQR_R4
    assert FIELD_B.nqr == NQR_Q4


def test_small_subgroup_matches_reference():
    assert FIELD_B_SMALL.small_subgroup_base == 5
    assert FIELD_B_SMALL.small_subgroup_power == 2
    assert FIELD_B_SMALL.full_root_of_unity == FULL_ROOT_OF_UNITY_R6
    # full root has exact order 2^15 * 25
    order = (1 << 15) * 25
    assert pow(FULL_ROOT_OF_UNITY_R6, order, P_MNT4_Q) == 1
    assert pow(FULL_ROOT_OF_UNITY_R6, order // 2, P_MNT4_Q) != 1
    assert pow(FULL_ROOT_OF_UNITY_R6, order // 5, P_MNT4_Q) != 1


def test_mnt4753_curve_constants_match_reference():
    m = mnt4753.get()
    assert m.Fr.p == MODULUS_R4 and m.Fq.p == MODULUS_Q4
    assert _planes_to_int(m.Fq, m.G1.a) == G1_A_M4
    assert _planes_to_int(m.Fq, m.G1.b) == G1_B_M4
    # twist coeffs (mnt4753_init.cpp:122-126): a2 = (a*nr, 0), b2 = (0, b*nr)
    a2 = np.asarray(m.G2.a)
    b2 = np.asarray(m.G2.b)
    nr = NQR_Q4
    assert _planes_to_int(m.Fq, a2[0]) == G1_A_M4 * nr % MODULUS_Q4
    assert _planes_to_int(m.Fq, a2[1]) == 0
    assert _planes_to_int(m.Fq, b2[0]) == 0
    assert _planes_to_int(m.Fq, b2[1]) == G1_B_M4 * nr % MODULUS_Q4
    # generators on-curve (exact host check): y^2 = x^3 + a x + b
    x = _planes_to_int(m.Fq, m.g1_generator()[0])
    y = _planes_to_int(m.Fq, m.g1_generator()[1])
    q = MODULUS_Q4
    assert (y * y - (x * x * x + G1_A_M4 * x + G1_B_M4)) % q == 0
    assert x == int(mnt4753.G1_ONE_X) and y == int(mnt4753.G1_ONE_Y)


def test_mnt6753_curve_constants_match_reference():
    m = mnt6753.get()
    assert m.Fr.p == MODULUS_Q4 and m.Fq.p == MODULUS_R4
    assert _planes_to_int(m.Fq, m.G1.a) == G1_A_M6
    assert _planes_to_int(m.Fq, m.G1.b) == G1_B_M6
    # twist coeffs (mnt6753_init.cpp:132-136): a3 = (0,0,a), b3 = (b*nr,0,0)
    a3 = np.asarray(m.G2.a)
    b3 = np.asarray(m.G2.b)
    q = MODULUS_R4
    assert _planes_to_int(m.Fq, a3[0]) == 0
    assert _planes_to_int(m.Fq, a3[1]) == 0
    assert _planes_to_int(m.Fq, a3[2]) == G1_A_M6
    assert _planes_to_int(m.Fq, b3[0]) == G1_B_M6 * NQR_R4 % q
    assert _planes_to_int(m.Fq, b3[1]) == 0
    assert _planes_to_int(m.Fq, b3[2]) == 0
    x = _planes_to_int(m.Fq, m.g1_generator()[0])
    y = _planes_to_int(m.Fq, m.g1_generator()[1])
    assert (y * y - (x * x * x + G1_A_M6 * x + G1_B_M6)) % q == 0


def test_frobenius_constants_match_reference():
    """The Frobenius/mul_by_q constants used by the device towers
    (ops.frobenius) equal the reference's published values."""
    from snark_challenge_prover_tpu.ops import frobenius as frob

    assert frob.mnt4753_twist_mul_by_q() == (
        TWIST_MUL_BY_Q_X_M4,
        TWIST_MUL_BY_Q_Y_M4,
    )
    assert frob.mnt6753_twist_mul_by_q() == (
        TWIST_MUL_BY_Q_X_M6,
        TWIST_MUL_BY_Q_Y_M6,
    )
    assert frob.fq3_frobenius_coeffs_c1(P_MNT4_R, 11) == (
        1,
        FROB_C1_1_M6,
        FROB_C1_2_M6,
    )

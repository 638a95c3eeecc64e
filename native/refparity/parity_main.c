/* Parity driver: runs the UNMODIFIED reference pairwise engine
 * (/root/reference/impl/{pairwiseAligner,stateMachine}.c) against
 * sequences piped in by tests/test_ref_parity.py, printing posterior
 * pairs / forward prob / EM expectations for comparison with the
 * cpecan_tpu engines.
 *
 * stdin: line 1 = seqX, line 2 = seqY,
 *        line 3 (optional) = anchors "x,y,expansion x,y,expansion ..."
 * argv:  parity_main MODE SMTYPE [threshold] [raggedLeft] [raggedRight] [hmmFile]
 *        MODE   = pairs | indels | forward | expectations
 *        SMTYPE = fiveState | fiveStateAsymmetric | threeState
 *                 | threeStateAsymmetric
 * stdout: pairs:  "x y prob" per line (prob = fixed-point/1e7)
 *         indels: same, prefixed with "M ", "X ", "Y "
 *         forward: one float (log prob)
 *         expectations: reference hmm_write text format
 */
#include "sonLib.h"
#include "pairwiseAligner.h"

static char *read_line(void) {
    char *line = stFile_getLineFromFile(stdin);
    if (line == NULL) {
        st_errAbort("parity_main: missing input line");
    }
    return line;
}

static stList *parse_anchors(const char *line) {
    stList *anchors = stList_construct3(0, (void (*)(void *))stIntTuple_destruct);
    const char *p = line;
    while (*p) {
        while (*p == ' ') {
            p++;
        }
        if (!*p) {
            break;
        }
        long long x, y, e;
        int consumed = 0;
        if (sscanf(p, "%lld,%lld,%lld%n", &x, &y, &e, &consumed) != 3) {
            st_errAbort("parity_main: bad anchor token at '%s'", p);
        }
        stList_append(anchors, stIntTuple_construct3(x, y, e));
        p += consumed;
    }
    return anchors;
}

static void print_pairs(stList *pairs, const char *prefix) {
    for (int64_t i = 0; i < stList_length(pairs); i++) {
        stIntTuple *t = stList_get(pairs, i);
        printf("%s%" PRIi64 " %" PRIi64 " %.9f\n", prefix,
               stIntTuple_get(t, 1), stIntTuple_get(t, 2),
               (double)stIntTuple_get(t, 0) / PAIR_ALIGNMENT_PROB_1);
    }
}

int main(int argc, char **argv) {
    if (argc < 3) {
        st_errAbort("usage: parity_main MODE SMTYPE [threshold] [raggedL] [raggedR] [hmmFile]");
    }
    const char *mode = argv[1];
    const char *smName = argv[2];
    double threshold = argc > 3 ? atof(argv[3]) : 0.01;
    bool raggedLeft = argc > 4 ? atoi(argv[4]) != 0 : 0;
    bool raggedRight = argc > 5 ? atoi(argv[5]) != 0 : 0;
    const char *hmmFile = (argc > 6 && argv[6][0] != '-') ? argv[6] : NULL;
    /* optional banding overrides (mirror the library-struct fields the
     * CLIs override): argv[7] = diagonalExpansion,
     * argv[8] = splitMatrixBiggerThanThis */
    long long diagExpansion = argc > 7 ? atoll(argv[7]) : -1;
    long long splitMatrix = argc > 8 ? atoll(argv[8]) : -1;

    StateMachineType type;
    if (strcmp(smName, "fiveState") == 0) {
        type = fiveState;
    } else if (strcmp(smName, "fiveStateAsymmetric") == 0) {
        type = fiveStateAsymmetric;
    } else if (strcmp(smName, "threeState") == 0) {
        type = threeState;
    } else if (strcmp(smName, "threeStateAsymmetric") == 0) {
        type = threeStateAsymmetric;
    } else {
        st_errAbort("parity_main: unknown state machine type %s", smName);
    }

    StateMachine *sM;
    if (hmmFile != NULL) {
        Hmm *hmm = hmm_loadFromFile(hmmFile);
        sM = hmm_getStateMachine(hmm);
        hmm_destruct(hmm);
    } else if (type == threeState || type == threeStateAsymmetric) {
        sM = stateMachine3_construct(type);
    } else {
        sM = stateMachine5_construct(type);
    }

    PairwiseAlignmentParameters *p = pairwiseAlignmentBandingParameters_construct();
    p->threshold = threshold;
    if (diagExpansion >= 0) {
        p->diagonalExpansion = diagExpansion;
    }
    if (splitMatrix >= 0) {
        p->splitMatrixBiggerThanThis = splitMatrix;
    }

    char *seqX = read_line();
    char *seqY = read_line();
    char *anchorLine = stFile_getLineFromFile(stdin);
    stList *anchors = parse_anchors(anchorLine == NULL ? "" : anchorLine);
    free(anchorLine);

    if (strcmp(mode, "pairs") == 0) {
        stList *pairs = getAlignedPairsUsingAnchors(sM, seqX, seqY, anchors, p,
                                                    raggedLeft, raggedRight);
        print_pairs(pairs, "");
        stList_destruct(pairs);
    } else if (strcmp(mode, "indels") == 0) {
        stList *pairs = NULL, *gapX = NULL, *gapY = NULL;
        getAlignedPairsWithIndelsUsingAnchors(sM, seqX, seqY, anchors, p,
                                              &pairs, &gapX, &gapY,
                                              raggedLeft, raggedRight);
        print_pairs(pairs, "M ");
        print_pairs(gapX, "X ");
        print_pairs(gapY, "Y ");
        stList_destruct(pairs);
        stList_destruct(gapX);
        stList_destruct(gapY);
    } else if (strcmp(mode, "mea") == 0) {
        double score = 0.0;
        stList *pairs = getShiftedMEAAlignment(seqX, seqY, anchors, p, sM,
                                               raggedLeft, raggedRight,
                                               &score);
        printf("score %.9f\n", score);
        print_pairs(pairs, "");
        stList_destruct(pairs);
    } else if (strcmp(mode, "forward") == 0) {
        double f = computeForwardProbability(seqX, seqY, anchors, p, sM,
                                             raggedLeft, raggedRight);
        printf("%.9f\n", f);
    } else if (strcmp(mode, "expectations") == 0) {
        Hmm *hmm = hmm_constructEmpty(0.000000000001, type);
        getExpectationsUsingAnchors(sM, hmm, seqX, seqY, anchors, p,
                                    raggedLeft, raggedRight);
        hmm_write(hmm, stdout);
        hmm_destruct(hmm);
    } else {
        st_errAbort("parity_main: unknown mode %s", mode);
    }

    stList_destruct(anchors);
    free(seqX);
    free(seqY);
    pairwiseAlignmentBandingParameters_destruct(p);
    stateMachine_destruct(sM);
    return 0;
}

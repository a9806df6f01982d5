/* Golden-file generator for FULL-LOOP behavioral parity: replays a
 * scripted scan sequence through the reference's localization+mapping
 * cycle — raycast model → ICP registration → error gate → pose update →
 * significance-gated grid push — exactly as ThreadLocalize::eventLoop
 * does in mode ICP (src/ThreadLocalize.cpp:310-409, doRegistration
 * :513-591, isRegistrationError :593-600, isPoseChangeSignificant
 * :728-736, maskMatrix :738-755), built from the UNMODIFIED reference
 * sources (see Makefile).  FLANN is replaced by the exact brute-force
 * 1-NN (BruteForcePairAssignment.h).
 *
 * Dumps the per-scan pose trace + gates for
 * tests/test_reference_parity_slam.py to diff against
 * SlamNode.process_scan.
 */
/* pre-include std headers so the visibility hack below cannot corrupt
 * their access specifiers (include guards make later includes no-ops) */
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#define private public
#define protected public

#include "obvision/reconstruct/grid/RayCastPolar2D.h"
#include "obvision/reconstruct/grid/SensorPolar2D.h"
#include "obvision/reconstruct/grid/TsdGrid.h"
#include "obvision/registration/icp/Icp.h"
#include "obvision/registration/icp/ClosedFormEstimator2D.h"
#include "obvision/registration/icp/assign/filter/DistanceFilter.h"
#include "obvision/registration/icp/assign/filter/OutOfBoundsFilter2D.h"
#include "obvision/registration/icp/assign/filter/ReciprocalFilter.h"

#include "obvision/registration/ransacMatching/TSD_PDFMatching.h"

#undef private
#undef protected

#include "BruteForcePairAssignment.h"

/* deterministic rand stream for the TSD matcher (mode 3): state +
 * functions as in ransac_harness.cpp (detrand.h declares them; the
 * matcher TUs are compiled with the shim force-included).  The ICP
 * path consumes no rand, so mode 0 output is unaffected. */
unsigned int det_rand_state = 1u;
int det_rand(void)
{
  det_rand_state = det_rand_state * 1103515245u + 12345u;
  return (int)(det_rand_state & 0x7fffffffu);
}
void det_srand(unsigned int) {}
void det_reset(unsigned int seed) { det_rand_state = seed; }

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

using namespace obvious;

static FILE* g_out = NULL;

static void dump_array(const char* name, char dtype, unsigned ndim,
                       const uint32_t* dims, const void* payload)
{
  uint32_t nl = (uint32_t)strlen(name);
  fwrite(&nl, 4, 1, g_out);
  fwrite(name, 1, nl, g_out);
  fwrite(&dtype, 1, 1, g_out);
  uint32_t nd = ndim;
  fwrite(&nd, 4, 1, g_out);
  size_t total = 1;
  for(unsigned i = 0; i < ndim; i++)
  {
    fwrite(&dims[i], 4, 1, g_out);
    total *= dims[i];
  }
  size_t esz = dtype == 'f' ? 8 : (dtype == 'i' ? 4 : 1);
  fwrite(payload, esz, total, g_out);
}

/* ThreadLocalize::calcAngle (ThreadLocalize.cpp:715-726) */
static double calcAngle(Matrix* T)
{
  double angle = 0.0;
  const double ARCSIN = asin((*T)(1, 0));
  const double ARCSINEG = asin((*T)(0, 1));
  const double ARCOS = acos((*T)(0, 0));
  if((ARCSIN > 0.0) && (ARCSINEG < 0.0))
    angle = ARCOS;
  else if((ARCSIN < 0.0) && (ARCSINEG > 0.0))
    angle = 2.0 * M_PI - ARCOS;
  return angle;
}

/* ThreadLocalize.cpp:593-600 */
static bool isRegistrationError(Matrix* T, double trnsMax, double rotMax)
{
  const double dx = (*T)(0, 2);
  const double dy = (*T)(1, 2);
  const double trnsAbs = sqrt(dx * dx + dy * dy);
  const double deltaPhi = calcAngle(T);
  return (trnsAbs > trnsMax) || (fabs(sin(deltaPhi)) > rotMax);
}

/* ThreadLocalize.cpp:728-736 */
static bool isPoseChangeSignificant(Matrix* lastPose, Matrix* curPose,
                                    double trnsMin, double rotMin)
{
  const double deltaX = (*curPose)(0, 2) - (*lastPose)(0, 2);
  const double deltaY = (*curPose)(1, 2) - (*lastPose)(1, 2);
  double deltaPhi = calcAngle(curPose) - calcAngle(lastPose);
  deltaPhi = fabs(sin(deltaPhi));
  const double trnsAbs = sqrt(deltaX * deltaX + deltaY * deltaY);
  return (deltaPhi > rotMin) || (trnsAbs > trnsMin);
}

/* ThreadLocalize.cpp:738-755 */
static Matrix maskMatrix(Matrix* Mat, bool* mask, unsigned int maskSize,
                         unsigned int validPoints)
{
  Matrix retMat(validPoints, 2);
  unsigned int cnt = 0;
  for(unsigned int i = 0; i < maskSize; i++)
  {
    if(mask[i])
    {
      retMat(cnt, 0) = (*Mat)(i, 0);
      retMat(cnt, 1) = (*Mat)(i, 1);
      cnt++;
    }
  }
  return retMat;
}

int main(int argc, char** argv)
{
  if(argc < 3)
  {
    fprintf(stderr, "usage: %s scenario.txt out.bin\n", argv[0]);
    return 1;
  }
  std::ifstream in(argv[1]);
  g_out = fopen(argv[2], "wb");
  if(!in || !g_out)
  {
    fprintf(stderr, "cannot open inputs\n");
    return 1;
  }

  std::string kw;
  double cellSize, maxTrunc;
  int layoutPart, layoutGrid;
  in >> kw >> cellSize >> layoutPart >> layoutGrid >> maxTrunc;

  unsigned size;
  double angRes, phiMin, maxRange, minRange, lowReflectivityRange;
  in >> kw >> size >> angRes >> phiMin >> maxRange >> minRange >>
      lowReflectivityRange;

  int icpIters;
  double distMax, distMin;
  double trnsMax, rotMax, trnsMin, rotMin;
  in >> kw >> icpIters >> distMax >> distMin;
  in >> kw >> trnsMax >> rotMax >> trnsMin >> rotMin;

  /* registration mode (ThreadLocalize.h:75-81): 0 = ICP only,
   * 3 = TSD_PDFMatching pre-registration + ICP refinement — the
   * reference's SHIPPED DEFAULT (config/single-laser.yaml:22).
   * The matcher's rand stream is det_reset(seed + k) per scan so
   * tests/golden_io.py can replay the draws scan-by-scan. */
  int regMode;
  unsigned ranTrials, ranSizeCtl, ranSeed;
  double ranEps, ranPhiMaxDeg, zrandTsd;
  in >> kw >> regMode >> ranTrials >> ranEps >> ranSizeCtl >>
      ranPhiMaxDeg >> zrandTsd >> ranSeed;

  double Tv[9];
  in >> kw;
  for(int i = 0; i < 9; i++) in >> Tv[i];
  Matrix Tinit(3, 3, Tv);

  double fpc[2], fpw, fph;
  in >> kw >> fpc[0] >> fpc[1] >> fpw >> fph;

  int nscan;
  in >> kw >> nscan;

  TsdGrid* grid = new TsdGrid(cellSize, (EnumTsdGridLayout)layoutPart,
                              (EnumTsdGridLayout)layoutGrid);
  grid->setMaxTruncation(maxTrunc);

  /* ThreadLocalize::init (:498-507): sensor at Tinit, free footprint,
   * initial push (INIT_PSHS = 1, SlamNode.h:30) */
  SensorPolar2D* sensor = new SensorPolar2D(size, angRes, phiMin,
                                            maxRange, minRange,
                                            lowReflectivityRange);
  sensor->transform(&Tinit);
  obfloat fpcf[2] = {(obfloat)fpc[0], (obfloat)fpc[1]};
  grid->freeFootprint(fpcf, fpw, fph);

  /* ICP stack (ThreadLocalize.cpp:209-226) */
  BruteForcePairAssignment* assigner = new BruteForcePairAssignment();
  OutOfBoundsFilter2D* filterBounds = new OutOfBoundsFilter2D(
      grid->getMinX(), grid->getMaxX(), grid->getMinY(), grid->getMaxY());
  assigner->addPreFilter(filterBounds);
  DistanceFilter* filterDist =
      new DistanceFilter(distMax, distMin, icpIters - 10);
  assigner->addPostFilter(filterDist);
  ReciprocalFilter* filterReciprocal = new ReciprocalFilter();
  assigner->addPostFilter(filterReciprocal);
  ClosedFormEstimator2D* estimator = new ClosedFormEstimator2D();
  Icp* icp = new Icp(assigner, estimator);
  icp->setMaxRMS(0.0);
  icp->setMaxIterations(icpIters);
  icp->setConvergenceCounter(icpIters);

  TSD_PDFMatching* tsdMatcher = NULL;
  if(regMode == 3)
  {
    tsdMatcher = new TSD_PDFMatching(*grid, ranTrials, ranEps,
                                     ranSizeCtl, zrandTsd);
  }

  RayCastPolar2D rayCaster;
  std::vector<double> modelCoords(2 * size), modelNormals(2 * size),
      scene(2 * size, 0.0);
  bool* maskM = new bool[size];
  bool* maskS = new bool[size];
  std::vector<double> ranges(size);

  Matrix lastPose(3, 3);
  std::vector<double> poseTrace, Ttrace;
  std::vector<int32_t> flags;   /* per scan: regError, significant */
  std::vector<unsigned char> maskMTrace, maskSTrace;
  std::vector<double> modelTrace, TpreTrace;
  std::vector<unsigned char> maskMpcaTrace, maskSpcaTrace;
  std::vector<int32_t> ctlTrace, trialTrace;
  std::vector<double> candLogTrace;   /* rows: scan, trial, i, logp */
  std::vector<double> phiMTrace, phiSTrace, sceneTrace, nsTrace;

  for(int k = 0; k < nscan; k++)
  {
    in >> kw;
    for(unsigned i = 0; i < size; i++) in >> ranges[i];

    sensor->setRealMeasurementData(ranges.data(), 1.0);
    sensor->setStandardMask();

    if(k == 0)
    {
      /* first scan: ThreadMapping::initPush (ThreadMapping.cpp:32-41) */
      grid->push(sensor);
      lastPose = sensor->getTransformation();
      Matrix P0 = sensor->getTransformation();
      for(int r = 0; r < 3; r++)
        for(int c = 0; c < 3; c++) poseTrace.push_back(P0(r, c));
      for(int i = 0; i < 9; i++) Ttrace.push_back(i % 4 == 0 ? 1.0 : 0.0);
      flags.push_back(0);
      flags.push_back(1);
      continue;
    }

    /* eventLoop body, mode ICP (ThreadLocalize.cpp:343-409) */
    unsigned validModelPoints = rayCaster.calcCoordsFromCurrentViewMask(
        grid, sensor, modelCoords.data(), modelNormals.data(), maskM);
    if(validModelPoints == 0)
    {
      fprintf(stderr, "scan %d: raycast found no coordinates\n", k);
      return 2;
    }
    double* scenePtr = scene.data();
    unsigned validScenePoints =
        sensor->dataToCartesianVectorMask(scenePtr, maskS);
    for(unsigned i = 0; i < size; i++)
    {
      maskMTrace.push_back(maskM[i] ? 1 : 0);
      maskSTrace.push_back(maskS[i] ? 1 : 0);
    }
    modelTrace.insert(modelTrace.end(), modelCoords.begin(),
                      modelCoords.end());

    Matrix M(size, 2, modelCoords.data());
    Matrix N(size, 2, modelNormals.data());
    Matrix S(size, 2, scene.data());
    Matrix Mvalid = maskMatrix(&M, maskM, size, validModelPoints);
    Matrix Nvalid = maskMatrix(&N, maskM, size, validModelPoints);
    Matrix Svalid = maskMatrix(&S, maskS, size, validScenePoints);

    /* doRegistration (:513-591) */
    Matrix T44(4, 4);
    T44.setIdentity();
    if(regMode == 3)
    {
      /* diagnostic: replicate the matcher's prep draws so the parity
       * test can diff its replay stage by stage (identical stream:
       * subsample -> control picks -> trial draws) */
      det_reset(ranSeed + (unsigned)k);
      {
        int pca = tsdMatcher->_pcaSearchRange;
        Matrix NMpca(size, 2);
        bool* mpca = new bool[size];
        memcpy(mpca, maskM, size * sizeof(bool));
        tsdMatcher->calcNormals(&M, &NMpca, maskM, mpca, pca / 2);
        Matrix NSpca(size, 2);
        bool* spca = new bool[size];
        memcpy(spca, maskS, size * sizeof(bool));
        unsigned vp = 0;
        for(unsigned i = 0; i < size; i++)
          if(spca[i]) vp++;
        double prob = 180.0 / (double)vp;
        if(prob < 0.99) tsdMatcher->subsampleMask(spca, size, prob);
        tsdMatcher->calcNormals(&S, &NSpca, maskS, spca, pca / 2);
        for(unsigned i = 0; i < size; i++)
        {
          maskMpcaTrace.push_back(mpca[i] ? 1 : 0);
          maskSpcaTrace.push_back(spca[i] ? 1 : 0);
        }
        std::vector<unsigned int> idxSv =
            tsdMatcher->extractSamples(&S, spca, pca / 2);
        std::vector<unsigned int> idxCtl;
        Matrix* C = tsdMatcher->pickControlSet(&S, idxSv, idxCtl);
        delete C;
        for(unsigned c = 0; c < ranSizeCtl; c++)
          ctlTrace.push_back(c < idxCtl.size() ? (int)idxCtl[c] : -1);
        std::vector<unsigned int> idxMv =
            tsdMatcher->extractSamples(&M, mpca, pca / 2);
        std::vector<unsigned int> idxTrials = idxMv;
        for(unsigned t = 0; t < ranTrials; t++)
        {
          if(idxTrials.empty()) { trialTrace.push_back(-1); continue; }
          int r = det_rand() % idxTrials.size();
          trialTrace.push_back((int)idxTrials[r]);
          idxTrials.erase(idxTrials.begin() + r);
        }
        /* exact per-candidate log-probabilities, replicated from the
         * matcher's scoring loop (TSD_PDFMatching.cpp:196-278) with
         * the SAME draws: lets the parity test diff scoring directly
         * (the Trace's %.9f prints underflow for small products) */
        {
          int span = (int)floor(
              std::min(ranPhiMaxDeg * M_PI / 180.0, M_PI * 0.5)
              / sensor->getAngularResolution());
          if(span > (int)size) span = (int)size;
          double* phiM2 = new double[size];
          double* phiS2 = new double[size];
          Matrix NM2(size, 2), NS2(size, 2);
          bool* mm2 = new bool[size];
          memcpy(mm2, maskM, size * sizeof(bool));
          tsdMatcher->calcNormals(&M, &NM2, maskM, mm2, pca / 2);
          tsdMatcher->calcPhi(&NM2, mm2, phiM2);
          tsdMatcher->calcPhi(&NSpca, spca, phiS2);
          for(unsigned i = 0; i < size; i++)
          {
            phiMTrace.push_back(mm2[i] ? phiM2[i] : -1e9);
            phiSTrace.push_back(spca[i] ? phiS2[i] : -1e9);
            sceneTrace.push_back(S(i, 0));
            sceneTrace.push_back(S(i, 1));
            nsTrace.push_back(spca[i] ? NSpca(i, 0) : -1e9);
            nsTrace.push_back(spca[i] ? NSpca(i, 1) : -1e9);
          }
          Matrix Ts2 = sensor->getTransformation();
          std::vector<unsigned int> idxSv2 = idxSv;
          /* rebuild the control matrix with the SAME indices */
          Matrix C2(3, (unsigned)idxCtl.size());
          for(unsigned c = 0; c < idxCtl.size(); c++)
          {
            C2(0, c) = S(idxCtl[c], 0);
            C2(1, c) = S(idxCtl[c], 1);
            C2(2, c) = 1.0;
          }
          for(unsigned t = 0; t < (unsigned)trialTrace.size()
              && t < ranTrials; t++)
          {
            /* trialTrace holds THIS scan's draws at the tail */
          }
          unsigned tbase = trialTrace.size() - ranTrials;
          for(unsigned t = 0; t < ranTrials; t++)
          {
            int idx = trialTrace[tbase + t];
            if(idx < 0) continue;
            int iMin = std::max(idx - span, pca / 2);
            int iMax = std::min(idx + span, (int)size - pca / 2);
            for(int i = iMin; i < iMax; i++)
            {
              if(!spca[i]) continue;
              double phi = phiM2[idx] - phiS2[i];
              if(phi > M_PI) phi -= 2.0 * M_PI;
              else if(phi < -M_PI) phi += 2.0 * M_PI;
              if(fabs(phi) >= std::min(ranPhiMaxDeg * M_PI / 180.0,
                                       M_PI * 0.5))
                continue;
              Matrix T2 = MatrixFactory::TransformationMatrix33(phi, 0, 0);
              T2(0, 2) = M(idx, 0) - (T2(0, 0) * S(i, 0) + T2(0, 1) * S(i, 1));
              T2(1, 2) = M(idx, 1) - (T2(1, 0) * S(i, 0) + T2(1, 1) * S(i, 1));
              Matrix TMap = Ts2 * T2;
              Matrix STemp = TMap * C2;
              double logp = 0.0;
              for(unsigned s = 0; s < STemp.getCols(); s++)
              {
                obfloat coord[2];
                coord[0] = STemp(0, s);
                coord[1] = STemp(1, s);
                obfloat tsd;
                if(!grid->interpolateBilinear(coord, &tsd))
                  logp += log(1.0 - (1.0 - zrandTsd) * fabs(tsd));
                else
                  logp += log(zrandTsd);
              }
              candLogTrace.push_back((double)k);
              candLogTrace.push_back((double)t);
              candLogTrace.push_back((double)i);
              candLogTrace.push_back(logp);
            }
          }
          delete[] phiM2;
          delete[] phiS2;
          delete[] mm2;
        }
        delete[] mpca;
        delete[] spca;
      }
      /* TSD branch (:558-568): matcher reads the CURRENT grid */
      det_reset(ranSeed + (unsigned)k);
      Matrix Ts = sensor->getTransformation();
      Matrix Tpre = tsdMatcher->match(
          Ts, &M, maskM, NULL, &S, maskS,
          ranPhiMaxDeg * M_PI / 180.0, trnsMax,
          sensor->getAngularResolution());

      T44(0, 0) = Tpre(0, 0);
      T44(0, 1) = Tpre(0, 1);
      T44(0, 3) = Tpre(0, 2);
      T44(1, 0) = Tpre(1, 0);
      T44(1, 1) = Tpre(1, 1);
      T44(1, 3) = Tpre(1, 2);
      for(int r = 0; r < 3; r++)
        for(int c = 0; c < 3; c++) TpreTrace.push_back(Tpre(r, c));
    }
    icp->reset();
    Matrix P = sensor->getTransformation();
    filterBounds->setPose(&P);
    icp->setModel(&Mvalid, &Nvalid);
    icp->setScene(&Svalid);
    double rms = 0.0;
    unsigned int pairs = 0;
    unsigned int it = 0;
    icp->iterate(&rms, &pairs, &it, &T44);
    Matrix T = icp->getFinalTransformation();

    const bool regError = isRegistrationError(&T, trnsMax, rotMax);
    bool significant = false;
    if(!regError)
    {
      sensor->transform(&T);
      Matrix curPose = sensor->getTransformation();
      if(isPoseChangeSignificant(&lastPose, &curPose, trnsMin, rotMin))
      {
        significant = true;
        lastPose = curPose;
        /* queuePush → ThreadMapping drains → grid.push
         * (ThreadMapping.cpp:43-63) */
        grid->push(sensor);
      }
    }

    Matrix cur = sensor->getTransformation();
    for(int r = 0; r < 3; r++)
      for(int c = 0; c < 3; c++) poseTrace.push_back(cur(r, c));
    for(int r = 0; r < 3; r++)
      for(int c = 0; c < 3; c++) Ttrace.push_back(T(r, c));
    flags.push_back(regError ? 1 : 0);
    flags.push_back(significant ? 1 : 0);
  }

  {
    uint32_t dims2[2] = {(uint32_t)nscan, 9};
    dump_array("pose_trace", 'f', 2, dims2, poseTrace.data());
    dump_array("T_trace", 'f', 2, dims2, Ttrace.data());
    uint32_t dimsf[2] = {(uint32_t)nscan, 2};
    dump_array("flags", 'i', 2, dimsf, flags.data());
    /* per-scan raycast masks + model coords (scans 1..nscan-1): lets
     * the parity test pinpoint which side of the matcher's inputs
     * diverges first */
    uint32_t dimsm[2] = {(uint32_t)(nscan - 1), size};
    dump_array("maskM_trace", 'b', 2, dimsm, maskMTrace.data());
    dump_array("maskS_trace", 'b', 2, dimsm, maskSTrace.data());
    uint32_t dimsmc[2] = {(uint32_t)(nscan - 1), 2 * size};
    dump_array("model_trace", 'f', 2, dimsmc, modelTrace.data());
    if(regMode == 3)
    {
      uint32_t dimsp[2] = {(uint32_t)(nscan - 1), 9};
      dump_array("Tpre_trace", 'f', 2, dimsp, TpreTrace.data());
      uint32_t dimspm[2] = {(uint32_t)(nscan - 1), size};
      dump_array("maskMpca_trace", 'b', 2, dimspm, maskMpcaTrace.data());
      dump_array("maskSpca_trace", 'b', 2, dimspm, maskSpcaTrace.data());
      uint32_t dimsc[2] = {(uint32_t)(nscan - 1), ranSizeCtl};
      dump_array("ctl_trace", 'i', 2, dimsc, ctlTrace.data());
      uint32_t dimst[2] = {(uint32_t)(nscan - 1), ranTrials};
      dump_array("trial_trace", 'i', 2, dimst, trialTrace.data());
      uint32_t dimscl[2] = {(uint32_t)(candLogTrace.size() / 4), 4};
      dump_array("cand_log_trace", 'f', 2, dimscl, candLogTrace.data());
      uint32_t dimsph[2] = {(uint32_t)(nscan - 1), size};
      dump_array("phiM_trace", 'f', 2, dimsph, phiMTrace.data());
      dump_array("phiS_trace", 'f', 2, dimsph, phiSTrace.data());
      uint32_t dimssc[2] = {(uint32_t)(nscan - 1), 2 * size};
      dump_array("scene_trace", 'f', 2, dimssc, sceneTrace.data());
      dump_array("ns_trace", 'f', 2, dimssc, nsTrace.data());
    }
  }

  fclose(g_out);
  printf("slam-loop golden data written to %s\n", argv[2]);
  return 0;
}

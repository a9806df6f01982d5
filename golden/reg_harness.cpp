/* Golden-file generator for the REGISTRATION layer: runs the reference's
 * actual Icp engine + estimators + post-filters (compiled unmodified from
 * /root/reference/src, see Makefile) on scripted model/scene sets and
 * dumps per-iteration transforms/RMS/pair counts for
 * tests/test_reference_parity.py.
 *
 * Exercised reference paths:
 *   Icp::step / iterate semantics        Icp.cpp:409-512
 *   Icp::applyTransformation             Icp.cpp:371-408
 *   ClosedFormEstimator2D                ClosedFormEstimator2D.cpp:36-109
 *   PointToLine2DEstimator               PointToLineEstimator2D.cpp:52-157
 *   PairAssignment filter chain          PairAssignment.cpp:38-84
 *   DistanceFilter (shrinking gate)      DistanceFilter.cpp:11-64
 *   ReciprocalFilter                     ReciprocalFilter.cpp:31-83
 *   OutOfBoundsFilter2D                  OutOfBoundsFilter2D.cpp:27-37
 *
 * FLANN is replaced by BruteForcePairAssignment.h (identical exact-1-NN
 * semantics; FLANN is not installed here).  The iterate() driver loop is
 * replicated below verbatim-in-structure with a dump inserted per step —
 * the access-specifier override only reads private state, it changes no
 * behavior.
 */
#define private public
#define protected public

#include "obvision/registration/icp/Icp.h"
#include "obvision/registration/icp/ClosedFormEstimator2D.h"
#include "obvision/registration/icp/PointToLineEstimator2D.h"
#include "obvision/registration/icp/assign/filter/DistanceFilter.h"
#include "obvision/registration/icp/assign/filter/OutOfBoundsFilter2D.h"
#include "obvision/registration/icp/assign/filter/ReciprocalFilter.h"

#undef private
#undef protected

#include "BruteForcePairAssignment.h"

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

static void dump_f64(const char* name, const std::vector<double>& v,
                     uint32_t d0, uint32_t d1 = 0)
{
  uint32_t dims[2] = {d0, d1};
  dump_array(name, 'f', d1 ? 2 : 1, dims, v.data());
}

static void dump_i32(const char* name, const std::vector<int32_t>& v,
                     uint32_t d0)
{
  uint32_t dims[1] = {d0};
  dump_array(name, 'i', 1, dims, v.data());
}

int main(int argc, char** argv)
{
  if(argc < 3)
  {
    fprintf(stderr, "usage: %s scenario.txt out.bin\n", argv[0]);
    return 1;
  }
  std::ifstream in(argv[1]);
  if(!in)
  {
    fprintf(stderr, "cannot open %s\n", argv[1]);
    return 1;
  }
  g_out = fopen(argv[2], "wb");
  if(!g_out)
  {
    fprintf(stderr, "cannot open %s\n", argv[2]);
    return 1;
  }

  std::string kw;
  int ncases;
  in >> kw >> ncases;

  for(int c = 0; c < ncases; c++)
  {
    std::string name, estName;
    int iterations, convcnt;
    double maxrms;
    int useDist, useRec, useOob;
    double distMax, distMin;
    int distIters;
    double ob[4];
    double poseV[9], tinitV[9];

    in >> kw >> name;
    in >> kw >> estName;
    in >> kw >> iterations >> maxrms >> convcnt;
    in >> kw >> useDist >> distMax >> distMin >> distIters;
    in >> kw >> useRec;
    in >> kw >> useOob >> ob[0] >> ob[1] >> ob[2] >> ob[3];
    in >> kw;
    for(int i = 0; i < 9; i++) in >> poseV[i];
    in >> kw;
    for(int i = 0; i < 9; i++) in >> tinitV[i];

    int M, S;
    in >> kw >> M;
    std::vector<double> model(2 * M), normals(2 * M);
    for(int i = 0; i < M; i++)
      in >> model[2 * i] >> model[2 * i + 1] >> normals[2 * i] >>
          normals[2 * i + 1];
    in >> kw >> S;
    std::vector<double> scene(2 * S);
    for(int i = 0; i < S; i++) in >> scene[2 * i] >> scene[2 * i + 1];

    /* stack construction mirrors ThreadLocalize.cpp:209-225 */
    BruteForcePairAssignment* assigner = new BruteForcePairAssignment();
    OutOfBoundsFilter2D* oob = NULL;
    Matrix pose(3, 3, poseV);
    if(useOob)
    {
      oob = new OutOfBoundsFilter2D(ob[0], ob[1], ob[2], ob[3]);
      oob->setPose(&pose);
      assigner->addPreFilter(oob);
    }
    DistanceFilter* dist = NULL;
    if(useDist)
    {
      dist = new DistanceFilter(distMax, distMin, distIters);
      assigner->addPostFilter(dist);
    }
    ReciprocalFilter* rec = NULL;
    if(useRec)
    {
      rec = new ReciprocalFilter();
      assigner->addPostFilter(rec);
    }
    IRigidEstimator* estimator;
    if(estName == "point_to_line")
      estimator = new PointToLine2DEstimator();
    else
      estimator = new ClosedFormEstimator2D();

    Icp* icp = new Icp(assigner, estimator);
    icp->setMaxRMS(maxrms);
    icp->setMaxIterations(iterations);
    icp->setConvergenceCounter(convcnt);

    Matrix Mm(M, 2, model.data());
    Matrix Nm(M, 2, normals.data());
    Matrix Sm(S, 2, scene.data());
    icp->setModel(&Mm, &Nm);
    icp->setScene(&Sm);

    /* ---- Icp::iterate (Icp.cpp:464-512) with a per-step dump ---- */
    icp->reset();
    Matrix Tinit44(4, 4);
    Tinit44.setIdentity();
    Tinit44(0, 0) = tinitV[0];
    Tinit44(0, 1) = tinitV[1];
    Tinit44(0, 3) = tinitV[2];
    Tinit44(1, 0) = tinitV[3];
    Tinit44(1, 1) = tinitV[4];
    Tinit44(1, 3) = tinitV[5];
    icp->_Tfinal4x4->setIdentity();
    bool identityInit = tinitV[0] == 1.0 && tinitV[1] == 0.0 &&
                        tinitV[2] == 0.0 && tinitV[3] == 0.0 &&
                        tinitV[4] == 1.0 && tinitV[5] == 0.0;
    if(!identityInit)
    {
      icp->applyTransformation(icp->_sceneTmp, icp->_sizeScene, icp->_dim,
                               &Tinit44);
      (*icp->_Tfinal4x4) = Tinit44 * (*icp->_Tfinal4x4);
    }

    double rms = 0.0;
    unsigned int pairs = 0;
    EnumIcpState eRetval = ICP_PROCESSING;
    unsigned int iter = 0;
    double rms_prev = 10e12;
    unsigned int conv_cnt = 0;
    std::vector<double> rmsHist, Thist;
    std::vector<int32_t> pairHist;
    while(eRetval == ICP_PROCESSING)
    {
      eRetval = icp->step(&rms, &pairs);
      iter++;

      Matrix Tcur = icp->getFinalTransformation();
      for(int r = 0; r < 3; r++)
        for(int cc = 0; cc < 3; cc++) Thist.push_back(Tcur(r, cc));
      rmsHist.push_back(rms);
      pairHist.push_back((int32_t)pairs);

      if(fabs(rms - rms_prev) < 10e-10)
        conv_cnt++;
      else
        conv_cnt = 0;
      if((rms <= maxrms || conv_cnt >= (unsigned)convcnt))
        eRetval = ICP_SUCCESS;
      else if(iter >= (unsigned)iterations)
        eRetval = ICP_MAXITERATIONS;

      rms_prev = rms;
    }

    Matrix Tf = icp->getFinalTransformation();
    std::vector<double> Tfv;
    for(int r = 0; r < 3; r++)
      for(int cc = 0; cc < 3; cc++) Tfv.push_back(Tf(r, cc));

    dump_f64((name + ".T_hist").c_str(), Thist, iter, 9);
    dump_f64((name + ".rms_hist").c_str(), rmsHist, iter);
    dump_i32((name + ".pair_hist").c_str(), pairHist, iter);
    dump_f64((name + ".T_final").c_str(), Tfv, 3, 3);
    std::vector<int32_t> meta(2);
    meta[0] = (int32_t)iter;
    meta[1] = (int32_t)eRetval;
    dump_i32((name + ".meta").c_str(), meta, 2);

    delete icp;
    delete assigner;  /* Icp does not own the assigner/estimator */
    delete estimator;
    delete oob;
    delete dist;
    delete rec;
  }

  fclose(g_out);
  printf("registration golden data written to %s\n", argv[2]);
  return 0;
}
